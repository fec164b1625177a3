"""Test configuration: force CPU with 8 virtual devices and f64.

Multi-chip sharding is validated on a virtual 8-device CPU mesh; numerical
parity tests run in float64 (matching the reference's double-precision
libpll kernels).
"""

import os

# hard-set, not setdefault: the sandbox may export JAX_PLATFORMS=axon
# globally, and the CLI honors an explicit env choice (cli.py) — tests
# driving the CLI must still land on CPU
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not honored when an accelerator plugin (axon) is
# present; the config update forces CPU reliably
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from epa_ng_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402

REF_DATA = "/root/reference/test/data"


@pytest.fixture(scope="session")
def data_dir():
    return REF_DATA
