from .mesh import Mesh, NamedSharding, P, local_device_count, make_mesh, shard_map
from .montecarlo import MonteCarloResult, make_round_fn, montecarlo_ber
from . import distributed

__all__ = [
    "Mesh",
    "NamedSharding",
    "P",
    "local_device_count",
    "make_mesh",
    "shard_map",
    "MonteCarloResult",
    "make_round_fn",
    "montecarlo_ber",
    "distributed",
]
