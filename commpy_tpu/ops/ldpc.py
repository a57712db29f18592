"""LDPC codes: design-file IO, systematic encoding, and batched BP decoding.

TPU-native redesign of reference commpy/channelcoding/ldpc.py:

* the design-file parser / writer keep the reference text format
  (ldpc.py:55-61) and dict keys for interop with published code designs;
* the decoder's per-block serial loop and per-row Python MSA loop
  (ldpc.py:197-238) become one fixed-shape batched program: messages live
  on a dense ``[B, n_cnodes, max_cnode_deg]`` edge tensor (the -1 padding
  of the adjacency lists maps to masked lanes), check-node updates are
  two-pass masked reductions (sign/magnitude split for SPA, two-min trick
  for MSA), variable-node updates are gather+sum;
* the reference's per-block syndrome early exit (ldpc.py:205) becomes a
  ``lax.while_loop`` whose carry freezes converged blocks, preserving the
  reference's exact iteration semantics while keeping shapes static.

Decoded outputs match the reference: hard word via signbit, posterior
LLRs, one block per column (Fortran order).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as splg

__all__ = [
    "get_ldpc_code_params",
    "build_matrix",
    "write_ldpc_params",
    "triang_ldpc_systematic_encode",
    "ldpc_bp_decode",
    "ldpc_bp_decode_device",
    "ldpc_bp_decode_sharded",
    "ldpc_encode_device",
]

_llr_max = 500.0  # reference ldpc.py:11


# --------------------------------------------------------------------------
# Design file IO (host)
# --------------------------------------------------------------------------

def _parse_ragged(lines, deg, max_deg):
    """Vectorized ragged-section parse: rows of 1-based neighbor ids ->
    a -1-padded [n, max_deg] 0-based adjacency matrix.

    One tokenization of the whole section, then a single scatter by
    (row, slot) computed from the degree prefix sums — no per-row loop.
    """
    n = len(deg)
    flat = np.array(" ".join(lines).split(), dtype=np.int64) - 1
    if flat.size != int(deg.sum()):
        raise ValueError(
            f"design file section has {flat.size} entries, degree list "
            f"promises {int(deg.sum())}"
        )
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    row = np.repeat(np.arange(n), deg)
    slot = np.arange(flat.size) - np.repeat(starts, deg)
    adj = -np.ones((n, max_deg), dtype=np.int64)
    adj[row, slot] = flat
    return adj, row, slot, flat


def get_ldpc_code_params(ldpc_design_filename, compute_matrix=False):
    """Parse an LDPC design file (text format of reference ldpc.py:55-61:
    header ``n_vnodes n_cnodes`` / ``max_vnode_deg max_cnode_deg``,
    degree lists, then 1-based per-vnode and per-cnode adjacency rows).

    From-scratch vectorized parse: each section is tokenized once and
    scattered into its padded adjacency matrix, and the vnode<->cnode
    cross-index maps (the slot of each shared edge in the peer's row)
    come from aligning the two sections' edge lists with one lexsort
    each — no per-node Python loops.  The returned dict schema is the
    established interop contract (flattened int32 adjacency/cross maps,
    -1 padding), byte-identical to previous rounds' output.
    """
    with open(ldpc_design_filename) as f:
        text = f.read().split("\n")
    n_vnodes, n_cnodes = (int(x) for x in text[0].split())
    max_vnode_deg, max_cnode_deg = (int(x) for x in text[1].split())
    vnode_deg_list = np.array(text[2].split(), dtype=np.int32)
    cnode_deg_list = np.array(text[3].split(), dtype=np.int32)
    if vnode_deg_list.size != n_vnodes or cnode_deg_list.size != n_cnodes:
        raise ValueError("degree list length does not match the header")

    vnode_adj_list, v_row, v_slot, v_peer = _parse_ragged(
        text[4:4 + n_vnodes], vnode_deg_list, max_vnode_deg
    )
    cnode_adj_list, c_row, c_slot, c_peer = _parse_ragged(
        text[4 + n_vnodes:4 + n_vnodes + n_cnodes],
        cnode_deg_list, max_cnode_deg,
    )

    # Cross-index maps: both sections list the SAME edge set, once as
    # (v, c, slot-in-v-row) and once as (c, v, slot-in-c-row).  Sorting
    # each by the edge key (v, c) aligns them element for element, so
    # the peer slots transfer with two scatters.
    v_order = np.lexsort((v_peer, v_row))    # edges sorted by (v, c)
    c_order = np.lexsort((c_row, c_peer))    # edges sorted by (v, c)
    if not (np.array_equal(v_row[v_order], c_peer[c_order])
            and np.array_equal(v_peer[v_order], c_row[c_order])):
        raise ValueError(
            "vnode and cnode sections disagree on the edge set"
        )
    cnode_vnode_map = -np.ones((n_cnodes, max_cnode_deg), dtype=np.int64)
    vnode_cnode_map = -np.ones((n_vnodes, max_vnode_deg), dtype=np.int64)
    cnode_vnode_map[c_row[c_order], c_slot[c_order]] = v_slot[v_order]
    vnode_cnode_map[v_row[v_order], v_slot[v_order]] = c_slot[c_order]

    ldpc_code_params = {
        "n_vnodes": n_vnodes,
        "n_cnodes": n_cnodes,
        "max_cnode_deg": max_cnode_deg,
        "max_vnode_deg": max_vnode_deg,
        "cnode_adj_list": cnode_adj_list.flatten().astype(np.int32),
        "vnode_adj_list": vnode_adj_list.flatten().astype(np.int32),
        "cnode_vnode_map": cnode_vnode_map.flatten().astype(np.int32),
        "vnode_cnode_map": vnode_cnode_map.flatten().astype(np.int32),
        "cnode_deg_list": cnode_deg_list,
        "vnode_deg_list": vnode_deg_list,
    }
    if compute_matrix:
        build_matrix(ldpc_code_params)
    return ldpc_code_params


def build_matrix(ldpc_code_params):
    """Build sparse H (CSC) and G = inv(H_sys) @ H_parity (CSR).

    Valid for approximately-triangular systematic codes
    (reference ldpc.py:13-48).  Adds both to the params dict.
    """
    n_cnodes = ldpc_code_params["n_cnodes"]
    deg = ldpc_code_params["cnode_deg_list"]
    adj = ldpc_code_params["cnode_adj_list"].reshape(
        (n_cnodes, ldpc_code_params["max_cnode_deg"])
    )
    rows = np.repeat(np.arange(n_cnodes), deg)
    cols = np.concatenate([adj[c, : deg[c]] for c in range(n_cnodes)])
    H = sp.csc_matrix(
        (np.ones(rows.size, np.int8), (rows, cols)),
        shape=(n_cnodes, ldpc_code_params["n_vnodes"]),
    )
    systematic_part = H[:, -n_cnodes:]
    parity_part = H[:, :-n_cnodes]
    ldpc_code_params["parity_check_matrix"] = H
    ldpc_code_params["generator_matrix"] = (
        splg.inv(systematic_part).dot(parity_part).tocsr()
    )


def write_ldpc_params(parity_check_matrix, file_path):
    """Write a parity-check matrix as a design file (reference ldpc.py:257)."""
    H = np.asarray(parity_check_matrix)
    with open(file_path, "x") as f:
        f.write("{} {}\n".format(H.shape[1], H.shape[0]))
        f.write("{} {}\n".format(H.sum(0).max(), H.sum(1).max()))
        for deg in H.sum(0):
            f.write("{} ".format(deg))
        f.write("\n")
        for deg in H.sum(1):
            f.write("{} ".format(deg))
        f.write("\n")
        for line in H.T:
            nodes = line.nonzero()[0]
            for node in nodes[:-1]:
                f.write("{}\t".format(node + 1))
            f.write("{}\n".format(nodes[-1] + 1))
        for col in H:
            nodes = col.nonzero()[0]
            for node in nodes[:-1]:
                f.write("{}\t".format(node + 1))
            f.write("{}\n".format(nodes[-1] + 1))
        f.write("\n")


# --------------------------------------------------------------------------
# Encoding
# --------------------------------------------------------------------------

def ldpc_encode_device(message_bits, generator_dense):
    """Batched systematic encode: ``[..., k] -> [..., n]``.

    parity = G @ m mod 2 as a dense matmul (MXU path) — G entries are 0/1
    and k < 2^24, so float32 accumulation is exact.
    """
    m = jnp.asarray(message_bits)
    G = jnp.asarray(generator_dense, jnp.float32)
    parity = jnp.mod(
        jnp.einsum("ck,...k->...c", G, m.astype(jnp.float32)), 2.0
    )
    return jnp.concatenate([m.astype(jnp.int8), parity.astype(jnp.int8)], -1)


def triang_ldpc_systematic_encode(message_bits, ldpc_code_params, pad=True):
    """Reference-compatible systematic encoder (ldpc.py:302-354)."""
    if (
        ldpc_code_params.get("generator_matrix") is None
        or ldpc_code_params.get("parity_check_matrix") is None
    ):
        build_matrix(ldpc_code_params)

    message_bits = np.asarray(message_bits)
    G = ldpc_code_params["generator_matrix"]
    block_length = G.shape[1]
    modulo = len(message_bits) % block_length
    if modulo:
        if pad:
            message_bits = np.concatenate(
                (message_bits, np.zeros(block_length - modulo, message_bits.dtype))
            )
        else:
            raise ValueError(
                "Padding is disable but message length is not a multiple of "
                "block length."
            )
    message_bits = message_bits.reshape(block_length, -1, order="F")

    Gd = np.asarray(G.todense()) % 2
    coded = np.asarray(
        ldpc_encode_device(message_bits.T.astype(np.int8), Gd)
    ).T  # [n_vnodes, n_blocks]
    return coded.squeeze().astype(np.int8)


# --------------------------------------------------------------------------
# Decoding
# --------------------------------------------------------------------------

def _prod_excl(x, mask):
    """Exact leave-one-out product along the last axis.

    Prefix/suffix products (loo[j] = prefix[j] * suffix[j]): 2*deg
    multiplies on ``[..., 1]`` slices, no transcendentals, no
    ``[..., deg, deg]`` intermediates, and zeros propagate exactly like
    the reference's divide-out-self semantics (ldpc.py:217-238).
    """
    xm = jnp.where(mask, x, 1.0)
    deg = xm.shape[-1]
    one = jnp.ones_like(xm[..., :1])
    prefix = [one]
    for j in range(1, deg):
        prefix.append(prefix[-1] * xm[..., j - 1 : j])
    suffix = [one]
    for j in range(deg - 2, -1, -1):
        suffix.append(suffix[-1] * xm[..., j + 1 : j + 2])
    suffix.reverse()
    out = jnp.concatenate(
        [prefix[j] * suffix[j] for j in range(deg)], axis=-1
    )
    return jnp.where(mask, out, 0.0)


@partial(jax.jit, static_argnames=("algorithm", "n_iters", "axis_name",
                                   "msa_scale", "msa_offset"))
def _bp_core(llr, cmask, Ainc, algorithm: str, n_iters: int,
             axis_name: str | None = None,
             msa_scale: float = 1.0, msa_offset: float = 0.0):
    """Belief propagation over the padded Tanner edge arrays.

    GATHER-FREE: the vnode<->edge permutations run as dense one-hot
    matmuls with the edge-incidence matrix (gathers in loops are
    scalar-slow on TPU; the incidence matmul runs on the MXU and its
    f32 accumulations of 0/1-weighted messages are exact sums).

    llr:   [B, n_v]
    cmask: [n_c, cd]  valid-edge mask
    Ainc:  [n_c*cd, n_v] f32 one-hot: edge e -> its variable node

    With ``axis_name`` set (edge-sharded mode, called under shard_map),
    cmask/Ainc hold only this device's check rows: variable-node sums and
    the convergence test are completed with ``psum`` over the mesh axis —
    the Tanner graph's edges are sharded while llr/decisions stay
    replicated (the domain's tensor parallelism).
    """
    B, n_v = llr.shape
    n_c, cd = cmask.shape

    def to_vnodes(edge_vals):
        # [B, n_c, cd] -> per-vnode sums [B, n_v]
        out = jax.lax.dot_general(
            edge_vals.reshape(B, n_c * cd), Ainc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out

    def to_edges(vnode_vals):
        # [B, n_v] -> value of each edge's vnode [B, n_c, cd]
        out = jax.lax.dot_general(
            vnode_vals, Ainc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, n_c, cd)

    def gather_total(c2v):
        return llr + to_vnodes(jnp.where(cmask, c2v, 0.0))

    def syndrome_ok(dec):
        par = jnp.sum(
            jnp.where(cmask, to_edges(dec.astype(jnp.float32)), 0.0),
            axis=-1,
        )  # [B, n_c] exact small-int sums in f32
        bad = jnp.any(jnp.mod(par, 2.0) != 0, axis=-1)  # [B]
        if axis_name is not None:
            bad = jax.lax.psum(bad.astype(jnp.int32), axis_name) > 0
        return ~bad

    def cn_update(v2c):
        if algorithm == "SPA":
            t = jnp.tanh(v2c * 0.5)
            prod = _prod_excl(t, cmask)
            msg = 2.0 * jnp.arctanh(jnp.clip(prod, -1.0, 1.0))
            return jnp.clip(msg, -_llr_max, _llr_max)
        elif algorithm == "MSA":
            sign = _prod_excl(jnp.sign(v2c), cmask)
            mag = jnp.where(cmask, jnp.abs(v2c), jnp.inf)
            # leave-one-out min via prefix/suffix mins (no argmin/onehot)
            big = jnp.full_like(mag[..., :1], jnp.inf)
            pref = [big]
            for j in range(1, cd):
                pref.append(jnp.minimum(pref[-1], mag[..., j - 1 : j]))
            suf = [big]
            for j in range(cd - 2, -1, -1):
                suf.append(jnp.minimum(suf[-1], mag[..., j + 1 : j + 2]))
            suf.reverse()
            loo_min = jnp.concatenate(
                [jnp.minimum(pref[j], suf[j]) for j in range(cd)], axis=-1
            )
            # normalized/offset min-sum: plain MSA at (1, 0) exactly
            mag_out = jnp.maximum(msa_scale * loo_min - msa_offset, 0.0)
            return jnp.where(cmask, sign * mag_out, 0.0)
        raise NameError(
            'Please input a valid decoder_algorithm string '
            '(meanning "SPA" or "MSA").'
        )

    dec0 = jnp.signbit(llr).astype(jnp.int8)
    c2v0 = jnp.zeros((B, n_c, cd), jnp.float32)
    out0 = llr

    def cond(state):
        it, _, _, dec, active = state
        return jnp.logical_and(it < n_iters, jnp.any(active & ~syndrome_ok(dec)))

    def body(state):
        it, c2v, out_llr, dec, active = state
        act = active & ~syndrome_ok(dec)  # [B]

        total = gather_total(c2v)  # [B, n_v]
        v2c = to_edges(total)  # [B, n_c, cd]
        v2c = jnp.where(cmask, v2c - c2v, 0.0)
        new_c2v = cn_update(v2c)

        new_total = gather_total(new_c2v)
        new_dec = jnp.signbit(new_total).astype(jnp.int8)

        sel = act[:, None, None]
        c2v = jnp.where(sel, new_c2v, c2v)
        out_llr = jnp.where(act[:, None], new_total, out_llr)
        dec = jnp.where(act[:, None], new_dec, dec)
        return it + 1, c2v, out_llr, dec, active

    _, _, out_llr, dec, _ = jax.lax.while_loop(
        cond, body, (0, c2v0, out0, dec0, jnp.ones(B, bool))
    )
    return dec, out_llr


def _edge_arrays(ldpc_code_params):
    """Device constants: (cmask [n_c, cd], Ainc [n_c*cd, n_v] one-hot).

    Cached on the params dict (keyed by id) — Ainc is the dense
    edge->vnode incidence used by the matmul message permutations.
    """
    cached = ldpc_code_params.get("_device_edge_arrays")
    if cached is not None:
        return cached
    n_v = ldpc_code_params["n_vnodes"]
    n_c = ldpc_code_params["n_cnodes"]
    cd = ldpc_code_params["max_cnode_deg"]
    cadj = ldpc_code_params["cnode_adj_list"].reshape(n_c, cd)
    cmask = cadj >= 0
    Ainc = np.zeros((n_c * cd, n_v), np.float32)
    e_idx = np.arange(n_c * cd)
    flat = cadj.reshape(-1)
    valid = flat >= 0
    Ainc[e_idx[valid], flat[valid]] = 1.0
    # Cache NUMPY arrays: caching device arrays here would leak tracers
    # when the caller invokes the decoder inside their own jit.
    out = (cmask, Ainc)
    ldpc_code_params["_device_edge_arrays"] = out
    return out


def _maybe_qc_params(ldpc_code_params):
    """Detect and cache quasi-cyclic structure of a design-file code.

    Every production standard's codes (WiMAX, 802.11n, DVB, 5G NR) are
    QC; recognizing the structure lets the decoder route through the
    roll-based / VMEM-resident QC path (ops/qcldpc.py, kernels/qc_bp.py)
    instead of the dense [E, n_v] incidence matmuls — same message
    schedule and latching, orders of magnitude less work.  Returns the
    QC params dict or None; cached on the params dict.
    """
    if "_qc_lift" in ldpc_code_params:
        return ldpc_code_params["_qc_lift"]
    from .qcldpc import detect_qc_structure

    n_c = ldpc_code_params["n_cnodes"]
    n_v = ldpc_code_params["n_vnodes"]
    g = int(np.gcd(n_c, n_v))
    qc = None
    for Z in sorted(
        {d for d in range(2, g + 1) if g % d == 0}, reverse=True
    ):
        if n_c // Z < 2:
            continue
        qc = detect_qc_structure(ldpc_code_params, Z)
        if qc is not None:
            break
    ldpc_code_params["_qc_lift"] = qc
    return qc


def ldpc_bp_decode_device(llr, ldpc_code_params, decoder_algorithm,
                          n_iters, backend: str = "auto",
                          msa_scale: float = 1.0, msa_offset: float = 0.0):
    """Batched BP decode: llr ``[..., n_vnodes]`` -> (dec int8, out_llr).

    ``backend="auto"`` lifts quasi-cyclic codes (all production designs,
    including the shipped WiMAX assets — 1440.720 is QC with Z=60) onto
    the roll-based QC path with its VMEM-resident Pallas kernel;
    ``backend="dense"`` forces the incidence-matmul core.
    ``msa_scale``/``msa_offset``: normalized/offset min-sum correction
    (same semantics as :func:`qcldpc.qc_bp_decode_device`); (1, 0) is
    the reference's plain MSA exactly.
    """
    if decoder_algorithm not in ("SPA", "MSA"):
        raise NameError(
            'Please input a valid decoder_algorithm string '
            '(meanning "SPA" or "MSA").'
        )
    if (msa_scale, msa_offset) != (1.0, 0.0) and decoder_algorithm != "MSA":
        raise ValueError("msa_scale/msa_offset apply to MSA only")
    if backend == "auto":
        qc = _maybe_qc_params(ldpc_code_params)
        if qc is not None:
            from .qcldpc import qc_bp_decode_device

            return qc_bp_decode_device(
                llr, qc, decoder_algorithm, n_iters,
                msa_scale=msa_scale, msa_offset=msa_offset,
            )
    x = jnp.asarray(llr, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    x = jnp.clip(x, -_llr_max, _llr_max)
    cmask, Ainc = _edge_arrays(ldpc_code_params)
    dec, out_llr = _bp_core(x, cmask, Ainc, decoder_algorithm, int(n_iters),
                            msa_scale=float(msa_scale),
                            msa_offset=float(msa_offset))
    dec = dec.reshape(lead + dec.shape[-1:])
    out_llr = out_llr.reshape(lead + out_llr.shape[-1:])
    if squeeze:
        return dec[0], out_llr[0]
    return dec, out_llr


def ldpc_bp_decode_sharded(llr, ldpc_code_params, decoder_algorithm,
                           n_iters, mesh, axis_name: str = "dp"):
    """Edge-sharded BP decode: one Tanner graph split across the mesh.

    The check rows (and their edges) are partitioned over the devices of
    ``mesh``; each device runs check-node updates for its rows only, and
    the variable-node sums / convergence test are completed with ``psum``
    over ICI (SURVEY §2 tensor-parallel row).  llr ``[..., n_vnodes]`` and
    the outputs stay replicated.  Numerically this reorders the per-vnode
    float sums (device partials first), so posterior LLRs can differ from
    the single-device decode by rounding.
    """
    from ..parallel.mesh import P, shard_map

    if decoder_algorithm not in ("SPA", "MSA"):
        raise NameError(
            'Please input a valid decoder_algorithm string '
            '(meanning "SPA" or "MSA").'
        )
    x = jnp.asarray(llr, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    x = jnp.clip(x.reshape(-1, x.shape[-1]), -_llr_max, _llr_max)

    cmask, Ainc = _edge_arrays(ldpc_code_params)
    D = mesh.shape[axis_name]
    n_c, cd = cmask.shape
    n_v = Ainc.shape[1]
    pad = (-n_c) % D
    if pad:  # all-masked rows decode as always-satisfied checks
        cmask = np.concatenate([cmask, np.zeros((pad, cd), bool)], 0)
        Ainc = np.concatenate(
            [Ainc, np.zeros((pad * cd, n_v), np.float32)], 0
        )

    def local(xs, cm, ai):
        return _bp_core(xs, cm, ai, decoder_algorithm, int(n_iters),
                        axis_name=axis_name)

    dec, out_llr = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(x, jnp.asarray(cmask), jnp.asarray(Ainc))
    dec = dec.reshape(lead + dec.shape[-1:])
    out_llr = out_llr.reshape(lead + out_llr.shape[-1:])
    if squeeze:
        return dec[0], out_llr[0]
    return dec, out_llr


def ldpc_bp_decode(llr_vec, ldpc_code_params, decoder_algorithm, n_iters):
    """Reference-compatible BP decode (ldpc.py:144-255).

    llr_vec: 1D float array, length a multiple of n_vnodes; several blocks
    are decoded at once (as one device batch instead of the reference's
    serial block loop).
    """
    llr_vec = np.asarray(llr_vec, float)
    n_v = ldpc_code_params["n_vnodes"]
    n_blocks = llr_vec.size // n_v
    blocks = llr_vec.reshape(n_blocks, n_v)
    dec, out = ldpc_bp_decode_device(
        blocks, ldpc_code_params, decoder_algorithm, n_iters
    )
    dec = np.asarray(dec).T.squeeze().astype(np.int8)
    out = np.asarray(out, float).T.squeeze()
    return dec, out
