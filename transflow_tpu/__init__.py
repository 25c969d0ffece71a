"""transflow-tpu — TPU-native optical-flow transfer framework.

A from-scratch rebuild of the capabilities of ychalier/transflow (reference
v1.11.1) designed for TPU: the per-frame pixel-mapping recurrence, the optical
flow estimators and the compositor run as fused jitted XLA/Pallas programs;
host code handles codecs, configuration and orchestration.
"""

__version__ = "0.1.0"

__all__ = ["__version__", "main", "enable_compile_cache"]


def enable_compile_cache(path: str | None = None):
    """Turn on jax's persistent compilation cache for this process.

    TPU compiles of the fused per-frame program take 30-500s (this
    environment routes them through a remote compile service); caching them
    across runs makes every CLI invocation after the first start instantly.
    """
    import os
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    if path is None:
        path = os.environ.get(
            "TRANSFLOW_COMPILE_CACHE",
            os.path.expanduser("~/.cache/transflow_tpu/jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def select_platform(platform: str | None = None):
    """Force the jax backend before it initializes.

    ``TRANSFLOW_PLATFORM=cpu transflow ...`` runs the whole pipeline on
    host CPU. ``JAX_PLATFORMS`` alone is not enough in environments whose
    sitecustomize registers a device plugin at interpreter startup and pins
    the platform — the choice must go through jax.config before the first
    backend use (same pattern as tests/conftest.py).
    """
    import os
    platform = platform or os.environ.get("TRANSFLOW_PLATFORM")
    if not platform:
        return
    import jax
    jax.config.update("jax_platforms", platform)


def main():
    select_platform()
    from .cli import main as _main
    _main()
