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
import numpy as np

from ..parallel.mesh import P, shard_map
from .trellis import Trellis
from .viterbi import viterbi_decode_device

__all__ = ["sharded_viterbi_stream", "sharded_turbo_stream"]


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


def sharded_turbo_stream(
    sys_stream,
    par1_stream,
    par2_stream,
    trellis: Trellis,
    noise_variance,
    n_iterations: int,
    p_array,
    mesh,
    *,
    warmup: int = 64,
    axis_name: str = "sp",
    max_log: bool = False,
    boundary_init: str = "warmup",
):
    """Turbo-decode ONE long frame sharded along time across the mesh.

    The BCJR alpha/beta recursions run per shard with ``warmup``-symbol
    state-metric halos exchanged via ``ppermute`` (the `_log_bcjr_windowed`
    sub-block idea, with sub-block == device shard) — the sequence-
    parallel analog of :func:`sharded_viterbi_stream` for turbo codes
    (VERDICT r1 item 6).  The interleaver is global, so each extrinsic
    exchange all-gathers the L-float LLR stream (T floats per hop — noise
    compared to the recursions), permutes with the host-constant
    ``p_array``, and re-slices locally.

    sys/par1/par2_stream : ``[T]`` BPSK-mapped symbol streams, sharded
        over ``axis_name``; T must divide by the mesh size.
    ``boundary_init='nii'`` drops the per-iteration halos entirely:
    each shard starts its recursions from the boundary alpha/beta its
    neighbors produced on the PREVIOUS turbo iteration, exchanged as
    two [S]-float ppermutes per MAP pass (vs 2 x warmup-symbol halos
    plus their recompute).  ``warmup`` is ignored in that mode.
    Returns the decoded bits ``[T]``, sharded the same way.
    """
    from .turbo import _bcjr_masked

    p_np = np.asarray(p_array, np.int64)
    T = p_np.size
    inv_np = np.empty_like(p_np)
    inv_np[p_np] = np.arange(T)
    D = mesh.shape[axis_name]
    if T % D:
        raise ValueError("frame length must divide by the mesh size")
    Tl = T // D
    if boundary_init not in ("warmup", "nii"):
        raise ValueError('boundary_init must be "warmup" or "nii"')
    W = int(warmup)
    if boundary_init == "warmup" and W > Tl:
        raise ValueError("warmup cannot exceed the per-device shard")
    p_j = jnp.asarray(p_np, jnp.int32)
    inv_j = jnp.asarray(inv_np, jnp.int32)
    nv = jnp.float32(noise_variance)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name),) * 3,
        out_specs=P(axis_name),
        check_vma=False,
    )
    def _run(sys_l, par1_l, par2_l):
        n_dev = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        first = (idx == 0)[None]  # [1] for the single-row BCJR batch
        last = idx == n_dev - 1
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        def halo(x):  # [Tl] -> [1, W + Tl + W]
            if W == 0:  # x[-0:] would alias the whole shard
                return x[None]
            lh = jax.lax.ppermute(x[Tl - W:], axis_name, right)
            rh = jax.lax.ppermute(x[:W], axis_name, left)
            return jnp.concatenate([lh, x, rh])[None]

        valid = jnp.concatenate(
            [
                jnp.broadcast_to(~first[0], (W,)),
                jnp.ones((Tl,), bool),
                jnp.broadcast_to(~last, (W,)),
            ]
        )[None]

        def gshift(x_l, perm):
            # global permutation of a sharded stream: all-gather (T floats),
            # constant-index permute, local re-slice
            full = jax.lax.all_gather(x_l, axis_name, tiled=True)
            return jax.lax.dynamic_slice(
                jnp.take(full, perm), (idx * Tl,), (Tl,)
            )

        sys_i_l = gshift(sys_l, p_j)

        if boundary_init == "nii":
            S = trellis.number_states
            exact = jnp.where(jnp.arange(S)[None, :] == 0, 0.0,
                              jnp.float32(-1e30))  # [1, S]
            uni = jnp.zeros((1, S), jnp.float32)
            valid_all = jnp.ones((1, Tl), bool)
            sys_e, par1_e = sys_l[None], par1_l[None]
            sysi_e, par2_e = sys_i_l[None], par2_l[None]
            a01 = a02 = jnp.where(first[:, None], exact, uni)
            bt1 = bt2 = uni

            def exchange(af, bf):
                # boundary handoff for the NEXT iteration: alpha flows
                # right (shard 0 keeps the exact frame start), beta
                # flows left (the last shard stays uniform)
                a0 = jnp.where(first[:, None], exact,
                               jax.lax.ppermute(af, axis_name, right))
                bT = jnp.where(last, uni,
                               jax.lax.ppermute(bf, axis_name, left))
                return a0, bT

            L1 = jnp.zeros((Tl,), jnp.float32)
            L2_l = L1
            for _ in range(int(n_iterations)):
                apps1, af1, bf1 = _bcjr_masked(
                    sys_e, par1_e, L1[None], nv, trellis, valid_all,
                    first, max_log, alpha_init=a01, beta_init=bt1,
                    return_carries=True,
                )
                a01, bt1 = exchange(af1, bf1)
                ext1 = apps1[0, :, 1] - apps1[0, :, 0]
                L2int = gshift(ext1, p_j)
                apps2, af2, bf2 = _bcjr_masked(
                    sysi_e, par2_e, L2int[None], nv, trellis, valid_all,
                    first, max_log, alpha_init=a02, beta_init=bt2,
                    return_carries=True,
                )
                a02, bt2 = exchange(af2, bf2)
                diff2 = apps2[0, :, 1] - apps2[0, :, 0]
                L2_l = L2int + diff2
                L1 = gshift(diff2, inv_j)

            return (gshift(L2_l, inv_j) > 0).astype(jnp.int8)

        sys_e = halo(sys_l)
        par1_e = halo(par1_l)
        sysi_e = halo(sys_i_l)
        par2_e = halo(par2_l)

        L1 = jnp.zeros((Tl,), jnp.float32)
        L2_l = L1
        for _ in range(int(n_iterations)):
            apps1 = _bcjr_masked(
                sys_e, par1_e, halo(L1), nv, trellis, valid, first, max_log
            )[0]
            ext1 = (apps1[:, 1] - apps1[:, 0])[W:W + Tl]
            L2int = gshift(ext1, p_j)
            apps2 = _bcjr_masked(
                sysi_e, par2_e, halo(L2int), nv, trellis, valid, first,
                max_log,
            )[0]
            diff2 = (apps2[:, 1] - apps2[:, 0])[W:W + Tl]
            L2_l = L2int + diff2
            L1 = gshift(diff2, inv_j)

        return (gshift(L2_l, inv_j) > 0).astype(jnp.int8)

    return _run(
        jnp.asarray(sys_stream, jnp.float32),
        jnp.asarray(par1_stream, jnp.float32),
        jnp.asarray(par2_stream, jnp.float32),
    )
