"""Platform selection helper.

Some images pre-register a TPU plugin and override ``JAX_PLATFORMS`` at
interpreter start; this restores the user's explicit choice (the env var)
after importing jax. Call before any backend is initialized.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    import jax

    wanted = os.environ.get("JAX_PLATFORMS")
    if wanted and jax.config.jax_platforms != wanted:
        try:
            jax.config.update("jax_platforms", wanted)
        except Exception:
            pass
