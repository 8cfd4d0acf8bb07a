"""Runtime/device helpers: persistent compile cache, device sync.

The TPU in this environment is reached through a remote-compile relay where
XLA compiles can take minutes; the persistent compilation cache makes every
entry point pay that cost once. (The reference has no equivalent — torch
eager; this is TPU-operational infrastructure.)
"""

import os

import jax

_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def setup_compilation_cache(path: str | None = None):
    """Enable the persistent XLA compilation cache (idempotent)."""
    cache_dir = path or os.environ.get("WESEP_JAX_CACHE", _DEFAULT_CACHE)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return cache_dir


def fetch_scalar(x) -> float:
    """Device->host sync point. Through the axon relay block_until_ready
    does not reliably wait; fetching a scalar does."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])
