"""Preamble for ad-hoc CPU-backend scripts on the axon dev box.

Import this FIRST (before jax does any backend init): forces the CPU
platform with 8 virtual devices and unregisters the remote-TPU (axon)
PJRT plugin, whose mere presence slows CPU-only execution 25-140x
(tests/conftest.py carries the measurement).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
