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
        # local_devices, NOT devices: under jax.distributed the global
        # device list leads with process 0's device, and pinning another
        # process's jit output there makes it unfetchable ("spans
        # non-addressable devices")
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()


def backend() -> str:
    import jax

    return jax.default_backend()


_WARM_THREAD = None


def _platforms_setting() -> str:
    """The jax_platforms value that WOULD govern backend resolution, without
    initializing any backend (config first — the axon sitecustomize pins it
    at interpreter start — then the env var)."""
    try:
        import jax

        val = jax.config.jax_platforms
        if val:
            return val
    except Exception:
        pass
    return os.environ.get("JAX_PLATFORMS", "")


def warm_backend_async() -> None:
    """Kick the axon session handshake in a daemon thread.

    The first device->host fetch of a process pays a 60-300s server-side
    handshake on the axon backend (measured 2026-08-19; it shows up on
    whatever np.asarray happens to run first and previously masqueraded as
    kernel time). Starting it here lets it overlap host-side input reading
    and encoding. Idempotent; a no-op unless the axon platform is in play
    (no handshake exists elsewhere, and a stage that never touches jax must
    not pay a backend init just to warm it).

    Exit safety: if the process finishes without ever joining the device
    (e.g. a host-only probe path), interpreter teardown would kill the
    daemon thread mid-XLA-init and SEGV — the atexit guard joins briefly,
    then flushes stdio and hard-exits before finalization can race it."""
    global _WARM_THREAD
    if _WARM_THREAD is not None:
        return
    if "axon" not in _platforms_setting():
        return
    import atexit
    import threading

    def _warm():
        try:
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jnp.zeros((8,), jnp.int32) + 1)
        except Exception:
            pass  # warming is an optimization only

    def _exit_guard():
        if _WARM_THREAD is None or not _WARM_THREAD.is_alive():
            return
        _WARM_THREAD.join(timeout=2.0)
        if _WARM_THREAD.is_alive():
            import sys

            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)

    atexit.register(_exit_guard)
    _WARM_THREAD = threading.Thread(
        target=_warm, name="sctag-backend-warm", daemon=True
    )
    _WARM_THREAD.start()


def warm_backend_join() -> None:
    """Block until the handshake warmer (if any) finished."""
    if _WARM_THREAD is not None:
        _WARM_THREAD.join()
