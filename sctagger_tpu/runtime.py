"""Runtime/JAX configuration helpers.

The axon TPU backend remote-compiles Pallas kernels; first compiles cost
minutes. A persistent compilation cache makes every subsequent process reuse
them.
"""

from __future__ import annotations

import os


def configure_jax(cache_dir: str | None = None) -> None:
    import jax

    cache = cache_dir or os.environ.get(
        "SCTAG_JAX_CACHE", os.path.expanduser("~/.cache/sctagger_tpu_jax")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only


def cpu_ctx():
    """Context manager pinning jnp work to the host CPU device (no-op when
    no CPU backend exists). Small/data-dependent-shape computations use this
    to avoid per-shape remote compiles on the TPU backend."""
    import contextlib

    import jax

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def backend() -> str:
    import jax

    return jax.default_backend()
