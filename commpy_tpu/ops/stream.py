"""Sequence-parallel stream decoding.

The reference decodes unbounded streams serially with a sliding traceback
window (convcode.py:644-657).  On a mesh, a long coded stream is sharded
along time instead; each device decodes its shard plus

* a **warmup halo** of W codewords from its left neighbour (survivor
  paths merge within a few constraint lengths, so after W >> 5K steps the
  windowed decisions coincide with the serial decoder's with overwhelming
  probability), and
* a **lookahead halo** of tb_depth codewords from its right neighbour
  (so its tail symbols get full-depth tracebacks),

exchanged with `ppermute` over ICI — halo exchange, not gathers.  This is
the domain's sequence parallelism: throughput scales with devices for a
single stream, at boundary decisions that are statistically equivalent to
the serial windowed decoder.

CAVEAT — complement-degenerate codes: if every generator polynomial has an
EVEN number of taps (counting the input tap), complementing state+input
leaves all codewords unchanged, so a mid-stream decoder cannot distinguish
a trajectory from its complement (only the known start state breaks the
tie).  Such codes cannot be sequence-sharded.  Standard codes are safe —
e.g. the true 802.11 (133,171)_OCTAL = (91,121) generators have odd tap
weight.  Note the reference's wifi80211 builds its trellis from DECIMAL
133/171 (wifi80211.py:49), which after the 7-bit truncation in
dec2bitarray is exactly such a degenerate code.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..parallel.mesh import P, shard_map
from .trellis import Trellis
from .viterbi import viterbi_decode_device

__all__ = ["sharded_viterbi_stream"]


def sharded_viterbi_stream(
    coded_sharded,
    trellis: Trellis,
    mesh,
    *,
    tb_depth: int = 0,
    decoding_type: str = "soft",
    warmup_codewords: int = 96,
    axis_name: str = "sp",
):
    """Decode a time-sharded coded stream; returns time-sharded message bits.

    coded_sharded : ``[n_coded]`` stream (bits / LLRs / reals by type),
        sharded over ``axis_name``; n_coded must divide evenly by
        mesh_size * n.
    """
    k, n = trellis.k, trellis.n
    if tb_depth <= 0:
        tb_depth = 5 * trellis.total_memory
    W = warmup_codewords
    R = tb_depth

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
        check_vma=False,
    )
    def _run(x_local):
        n_dev = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        n_local_cw = x_local.shape[0] // n

        right_shift = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left_shift = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        left_halo = jax.lax.ppermute(
            x_local[-W * n :], axis_name, right_shift
        )
        right_halo = jax.lax.ppermute(
            x_local[: R * n], axis_name, left_shift
        )
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            idx == n_dev - 1, jnp.zeros_like(right_halo), right_halo
        )
        ext = jnp.concatenate([left_halo, x_local, right_halo])
        L_ext = (W + n_local_cw + R) * k
        bits = viterbi_decode_device(
            ext, trellis, tb_depth, decoding_type, L=L_ext
        )
        return bits[W * k : W * k + n_local_cw * k]

    return _run(coded_sharded)
