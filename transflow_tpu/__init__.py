"""transflow-tpu — TPU-native optical-flow transfer framework.

A from-scratch rebuild of the capabilities of ychalier/transflow (reference
v1.11.1) designed for TPU: the per-frame pixel-mapping recurrence, the optical
flow estimators and the compositor run as fused jitted XLA/Pallas programs;
host code handles codecs, configuration and orchestration.
"""

__version__ = "0.1.0"

__all__ = ["__version__", "main"]


def main():
    from .cli import main as _main
    _main()
