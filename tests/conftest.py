"""Test configuration: force the CPU backend with 8 virtual devices.

The dev box routes JAX to a single remote TPU chip (axon). Tests must be
fast and must exercise multi-device sharding, so we force the host CPU
platform and split it into 8 virtual devices BEFORE any backend init.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Unregister the remote-TPU (axon) PJRT plugin entirely: even as a
# non-default backend its mere presence routes something through the
# remote tunnel during CPU execution — measured 25-140x wall-clock on
# identical CPU programs (8-device MC round: 2.4 s without the plugin,
# 60-360 s with it, varying with the service's own load).
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:  # private API; harmless if it moved
    pass

# Make the reference implementation importable for golden cross-checks.
_REF = "/root/reference"
if os.path.isdir(_REF) and _REF not in sys.path:
    sys.path.insert(0, _REF)
