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
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (billion-parameter decode graphs
    take tens of minutes to compile on a 1-core host; the cache makes any
    rerun of an unchanged graph near-instant). Opt out with
    PASERO_COMPILE_CACHE=0 or redirect with PASERO_COMPILE_CACHE=<dir>."""
    import jax

    choice = os.environ.get("PASERO_COMPILE_CACHE", "")
    if choice == "0":
        return
    # the RESOLVED config wins over the env var: a test harness may force
    # cpu via jax.config while the image's JAX_PLATFORMS still says the
    # TPU plugin — trusting the env there cached CPU executables whose
    # AOT reloads spam machine-feature-mismatch warnings (SIGILL risk)
    platforms = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS") or "")
    if not choice and ("cpu" in platforms or not platforms):
        # XLA:CPU persists AOT machine code whose feature baseline can
        # differ from the executing host (SIGILL risk + noisy loader
        # errors); CPU compiles are cheap anyway. An *unset* platform may
        # silently resolve to CPU on a CPU-only host, so only enable the
        # cache when a non-CPU platform is explicitly selected, or opt in
        # with PASERO_COMPILE_CACHE=<dir>. TPU images set JAX_PLATFORMS.
        return
    cache_dir = choice or os.path.expanduser("~/.cache/pasero_tpu/xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
