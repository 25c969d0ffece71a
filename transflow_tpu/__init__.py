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


def main():
    from .cli import main as _main
    _main()
