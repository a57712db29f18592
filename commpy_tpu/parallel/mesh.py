"""Device mesh helpers.

The framework's parallelism model (replacing the reference's serial
Monte-Carlo while-loop, links.py:313-338):

* **data parallel** ('dp'): independent Monte-Carlo frames sharded over all
  devices; BER/FER tallies reduced with psum over ICI;
* per-device PRNG via `jax.random.fold_in` on the axis index;
* multi-host: `jax.distributed.initialize` + the same mesh spanning hosts
  (collectives ride ICI within a slice, DCN across).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

P = PartitionSpec

__all__ = ["make_mesh", "shard_map", "P", "Mesh", "NamedSharding",
           "local_device_count"]


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))
