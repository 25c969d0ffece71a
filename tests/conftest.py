"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU compiles are slow (~20-40s each) and the CI box exposes a single chip;
CPU with forced host devices gives fast compiles and lets multi-device
sharding tests run anywhere.
"""
import os
import sys

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the tunneled
# TPU); tests must not depend on it. Override with TRANSFLOW_TEST_PLATFORM.
os.environ["JAX_PLATFORMS"] = os.environ.get("TRANSFLOW_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
