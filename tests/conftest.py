"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the XLA host platform with 8 virtual
devices (no TPU pod slice needed); the driver separately compile-checks the
TPU path via __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment ships an 'axon' TPU-tunnel plugin that wins platform
# selection even with JAX_PLATFORMS=cpu in the env; force it via the config
# API (must run before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
