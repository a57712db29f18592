"""Pipeline parallelism: stage a link chain across the device mesh.

Closes the SURVEY §2 "pipeline parallelism" row (stage Tx -> channel ->
Rx across devices).  The reference has no analog — its link loop is a
single-threaded Python while (links.py:313-338); here the stages of a
link become a software pipeline over a mesh axis, the TPU-idiomatic
realization of stage parallelism:

* one device per stage; in-flight microbatches hop device-to-device via
  ``jax.lax.ppermute`` (nearest-neighbor ICI traffic only — no
  all-to-all, no host);
* every device runs the SAME program (SPMD): its stage is selected with
  ``lax.switch`` on the mesh axis index, so the whole schedule jits as
  one XLA program with static shapes;
* the fill-drain schedule is the classic GPipe rotation: with M
  microbatches and D stages the pipeline runs M + D - 1 ticks, and
  utilization approaches 1 as M >> D.

Stages exchange a fixed "wire" tensor (one microbatch's worth of data,
any static shape): real link stages produce differently-shaped data
(bits -> symbols -> LLRs), which SPMD's uniform-shape requirement can't
carry natively, so each stage packs its result into the wire buffer —
the same discipline NCCL/MPI pipeline frameworks impose on their
send/recv buffers, made explicit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .mesh import Mesh, P, shard_map

__all__ = ["pipeline_map"]


def pipeline_map(stage_fns, microbatches, mesh: Mesh,
                 axis_name: str = "dp"):
    """Run microbatches through a device-staged pipeline.

    Parameters
    ----------
    stage_fns : sequence of D callables, wire -> wire (same static
        shape/dtype in and out; pack/unpack inside the stage).  Stage d
        runs on mesh device d along ``axis_name``.
    microbatches : ``[M, *wire]`` — microbatch m enters stage 0 at tick
        m, exits stage D-1 at tick m + D - 1.
    mesh : the device mesh; ``axis_name`` must have exactly D devices.

    Returns ``[M, *wire]``: the fully-processed microbatches, equal to
    ``stack([fD(...f1(x_m)) for m])`` up to float associativity.
    """
    D = mesh.shape[axis_name]
    if len(stage_fns) != D:
        raise ValueError(
            f"{len(stage_fns)} stages for a {D}-device '{axis_name}' axis"
        )
    M = microbatches.shape[0]
    wire_shape = microbatches.shape[1:]
    n_ticks = M + D - 1
    fwd = [(d, (d + 1) % D) for d in range(D)]

    def run(mb):  # mb: [M, *wire], replicated
        idx = jax.lax.axis_index(axis_name)
        is_first = idx == 0
        is_last = idx == D - 1

        def tick(k, carry):
            buf, out = carry  # buf [*wire] in-flight; out [M, *wire]
            # my stage processes the buffer it received LAST tick;
            # stage d works on microbatch k - d when 0 <= k - d < M
            m_here = k - idx
            live = (m_here >= 0) & (m_here < M)
            y = jax.lax.switch(idx, list(stage_fns), buf)
            y = jnp.where(live, y, buf)
            # completed microbatch leaves the last stage
            out = jax.lax.cond(
                live & is_last,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(m_here, 0), 0
                ),
                lambda o: o,
                out,
            )
            # rotate: stage d's output feeds stage d+1 next tick; the
            # wrap-around into stage 0 is overwritten by the next fresh
            # microbatch
            nxt = jax.lax.ppermute(y, axis_name, fwd)
            fresh = jax.lax.dynamic_index_in_dim(
                mb, jnp.clip(k + 1, 0, M - 1), 0, keepdims=False
            )
            nxt = jnp.where(is_first, fresh, nxt)
            return nxt, out

        buf0 = jax.lax.dynamic_index_in_dim(mb, 0, 0, keepdims=False)
        buf0 = jnp.where(is_first, buf0, jnp.zeros(wire_shape, mb.dtype))
        out0 = jnp.zeros((M,) + wire_shape, mb.dtype)
        _, out = jax.lax.fori_loop(0, n_ticks, tick, (buf0, out0))
        # only the last stage holds real outputs; everyone else holds 0
        return jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name
        )

    return jax.jit(
        shard_map(
            run, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False,
        )
    )(microbatches)
