"""Multi-host (pod) initialization.

The reference is single-process (SURVEY §5 — no distributed backend).
Here, scaling past one host is the standard JAX recipe: initialize the
distributed runtime, then build ONE global mesh spanning every process;
`shard_map` + psum in the Monte-Carlo engine then ride ICI inside a slice
and DCN across hosts with no further code changes.

Typical pod sweep:

    from commpy_tpu.parallel import distributed, make_mesh, montecarlo_ber
    distributed.initialize()          # reads TPU env on each host
    mesh = make_mesh()                # global mesh over all devices
    res = montecarlo_ber(..., mesh=mesh,
                         frames_per_round=N * mesh.devices.size)

Keep per-round chunks large so the host-side stopping decision (the only
synchronization) is rare relative to device work — that is what makes the
scaling linear over DCN.
"""
from __future__ import annotations

import jax

__all__ = ["initialize", "is_initialized", "process_info"]

_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments, autodetects from the TPU environment
    (`jax.distributed.initialize()` semantics).  Safe to call on a single
    host: it becomes a no-op if only one process exists and autodetection
    is unavailable.
    """
    global _initialized
    if _initialized:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    except (ValueError, RuntimeError):
        # single-process environment without coordinator info
        _initialized = False


def is_initialized() -> bool:
    return _initialized


def process_info():
    """(process_index, process_count, local_device_count, device_count)."""
    return (
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
