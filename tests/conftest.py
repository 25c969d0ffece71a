"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU compiles are slow (~20-40s each, and routed through a remote compile
service in this environment) and the CI box exposes a single chip; CPU with
forced host devices gives fast local compiles and lets multi-device sharding
tests run anywhere.

Gotcha: /root/.axon_site/sitecustomize.py (on PYTHONPATH) imports jax at
*interpreter startup* and registers the axon TPU plugin, so env-var changes
here are too late — the platform must be forced through jax.config before
any backend initializes.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("TRANSFLOW_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (usually already imported by sitecustomize)

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
assert jax.devices()[0].platform == os.environ["JAX_PLATFORMS"], (
    "backend initialized before conftest could select the test platform")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
