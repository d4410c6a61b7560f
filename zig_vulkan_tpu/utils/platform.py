"""Backend-platform pinning.

The session environment registers a TPU PJRT plugin whose hook wraps
``jax._src.xla_bridge.get_backend`` and routes to the TPU regardless of
``JAX_PLATFORMS`` in the environment — so a user's explicit
``JAX_PLATFORMS=cpu`` is silently ignored unless the request is promoted
to a ``jax.config`` pin before the first backend initializes.

Every process-level entry point (app, benchmarks, driver dryrun) calls
:func:`pin_platform_from_env` first thing; library code never does.
"""

from __future__ import annotations

import os

_PLUGIN_DEFAULT = "axon"


def pin_platform_from_env() -> None:
    """Honor an explicit JAX_PLATFORMS override at the jax.config level.

    A value equal to the session plugin default ("axon") — or an unset
    variable — keeps the normal TPU path; anything else (typically "cpu")
    is pinned so the plugin hook cannot re-route the process to a TPU
    tunnel the user asked to avoid.
    """
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat or plat == _PLUGIN_DEFAULT:
        return
    import jax

    jax.config.update("jax_platforms", plat)
