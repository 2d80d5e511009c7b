"""Platform selection helpers.

This environment's sitecustomize registers the axon TPU PJRT plugin and
*forces* ``jax_platforms="axon,cpu"`` at interpreter startup, so shell-level
``JAX_PLATFORMS=cpu`` is ignored.  Use :func:`force_cpu` (before or after
backend init — it clears backends if needed) to run on the host CPU with a
virtual multi-device mesh.
"""

from __future__ import annotations


def enable_compile_cache(path: str = "/tmp/jax_compile_cache") -> None:
    """Persistent XLA compilation cache — this box has 2 CPU cores, so
    cold compiles are expensive; the cache makes reruns near-instant."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_cpu(num_devices: int = 8) -> None:
    import os

    # IMPORTANT: the env vars must be set too, not just the config — with
    # JAX_PLATFORMS=axon still in the env, the axon plugin's remote-compile
    # hook intercepts even CPU compilations and routes them through the TPU
    # tunnel (compiles go from ~2 s to minutes).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={num_devices}"
        ).strip()

    import jax

    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_devices)
