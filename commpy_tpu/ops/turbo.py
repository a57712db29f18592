"""Turbo codes: rate-1/3 PCCC encoder + log-MAP (BCJR) decoder.

TPU-native redesign of reference commpy/channelcoding/turbo.py:

* the reference's probability-domain BCJR with per-step sum-normalization
  (turbo.py:78-158) — numerically fragile — becomes a **log-domain**
  forward/backward pair of ``lax.scan``s (logsumexp normalization is the
  exact log-space image of the reference's normalization, so extrinsic
  outputs agree up to floating-point);
* the per-(state, input) Python loops become dense ``[T, S, I]`` tensor
  ops; the decoder vmaps over a batch of codewords;
* interleaving is a permutation gather (interleavers.py:13-47 semantics).

Branch model matches turbo.py:62-76: rate-1/2 RSC component code, BPSK
mapping (bit -> 2b-1), codeword bit0 = systematic, bit1 = parity, branch
log-prob = -((x - cs)^2 + (y - cp)^2) / (2 sigma^2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .convcode import conv_encode, encode_scan
from .trellis import Trellis
from ..utils.bits import np_unpack_bits, pack_bits, unpack_bits

__all__ = [
    "turbo_encode",
    "turbo_encode_device",
    "map_decode",
    "map_decode_device",
    "turbo_decode",
    "turbo_decode_device",
]


# --------------------------------------------------------------------------
# Encoding
# --------------------------------------------------------------------------

def turbo_encode(msg_bits, trellis1: Trellis, trellis2: Trellis, interleaver):
    """Reference-compatible turbo encoder (turbo.py:14-59).

    Returns [sys_stream, non_sys_stream_1, non_sys_stream_2] with the
    reference's exact lengths (including the historical long tail on the
    second parity stream).
    """
    msg_bits = np.asarray(msg_bits)
    stream = conv_encode(msg_bits, trellis1, "rsc")
    sys_stream = stream[::2]
    non_sys_stream_1 = stream[1::2]

    interlv_msg_bits = interleaver.interlv(sys_stream)
    puncture_matrix = np.array([[0, 1]])
    non_sys_stream_2 = conv_encode(
        interlv_msg_bits, trellis2, "rsc", puncture_matrix
    )

    sys_stream = sys_stream[0 : -trellis1.total_memory]
    non_sys_stream_1 = non_sys_stream_1[0 : -trellis1.total_memory]
    non_sys_stream_2 = non_sys_stream_2[0 : -trellis2.total_memory]
    return [sys_stream, non_sys_stream_1, non_sys_stream_2]


def _rsc_with_tail(bits, trellis: Trellis):
    """Batched RSC encode with the reference tail drive (convcode.py:542-550).

    bits: ``[..., L]``; returns output bits ``[..., L + tm, n]``.
    Only k == 1 codes (the turbo component-code case) are supported on the
    device path.
    """
    assert trellis.k == 1, "device turbo path supports k=1 component codes"
    tm = trellis.total_memory
    out_main, state = encode_scan(bits, trellis)
    lead = bits.shape[:-1]
    out_main = out_main.reshape(lead + (-1, trellis.n))

    nst = jnp.asarray(trellis.next_state_table, jnp.int32)
    ot = jnp.asarray(trellis.output_table, jnp.int32)

    # Tail inputs: reversed state bits of the state reached after the main
    # body; bit i of the tail is term_bits[i] (data-dependent!).
    term_bits = unpack_bits(state, tm)[..., ::-1].astype(jnp.int32)

    def tail_step(carry, i):
        st = carry
        u = jnp.take_along_axis(
            term_bits, jnp.broadcast_to(i, st.shape)[..., None], axis=-1
        )[..., 0]
        out = ot[st, u]
        return nst[st, u], out

    _, tail_out = jax.lax.scan(tail_step, state, jnp.arange(tm))
    tail_out = jnp.moveaxis(tail_out, 0, -1)  # [..., tm]
    tail_bits = unpack_bits(tail_out, trellis.n)
    return jnp.concatenate([out_main, tail_bits], axis=-2)


def turbo_encode_device(msg_bits, trellis1: Trellis, trellis2: Trellis,
                        p_array):
    """Batched turbo encoder.

    msg_bits: ``[..., L]``; p_array: interleaver permutation ``[L]``.
    Returns (sys, par1, par2), each ``[..., L]`` — the portions a turbo
    decoder consumes (reference trims tails the same way, turbo.py:55-57).
    """
    msg_bits = jnp.asarray(msg_bits)
    L = msg_bits.shape[-1]
    lead = msg_bits.shape[:-1]
    # turbo_encode passes termination='rsc', which in the reference means
    # NO tail drive (convcode.py:542 guard) — tail slots are zeros and are
    # trimmed away, so the decoder-visible streams are just the main body.
    out1, _ = encode_scan(msg_bits, trellis1)
    out1 = out1.reshape(lead + (L, trellis1.n))
    sys = out1[..., 0]
    par1 = out1[..., 1]

    interleaved = jnp.take(sys, jnp.asarray(p_array), axis=-1)
    out2, _ = encode_scan(interleaved, trellis2)
    out2 = out2.reshape(lead + (L, trellis2.n))
    par2 = out2[..., 1]
    return sys, par1, par2


# --------------------------------------------------------------------------
# Log-MAP decoding
# --------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("trellis", "compute_decode", "max_log"))
def _log_bcjr(
    sys_symbols,  # [B, T]
    par_symbols,  # [B, T]
    L_int,  # [B, T]
    noise_variance,
    trellis: Trellis,
    compute_decode: bool = True,
    max_log: bool = False,
):
    # max_log=True replaces every logsumexp with max (max-log-MAP):
    # ~2x fewer transcendentals at a fraction-of-a-dB BER cost.
    #
    # GATHER-FREE: every in-scan state-index lookup is either a one-hot
    # matmul (MXU) or precomputed by evaluating the branch model on
    # reordered constant tables — gathers inside scans lower to scalar
    # loops on TPU.
    B, T = sys_symbols.shape
    nst_np, cs_np, cp_np, ps_np, pu_np = _bcjr_tables_np(trellis)
    S, I = nst_np.shape
    neg_inf = jnp.float32(-1e30)
    lse2 = (jnp.maximum if max_log else jnp.logaddexp)
    lseS = (
        (lambda x, axis: jnp.max(x, axis=axis)) if max_log
        else jax.nn.logsumexp
    )
    out_cs = jnp.asarray(cs_np)
    out_cp = jnp.asarray(cp_np)

    # One-hot permutations: Pn[u] maps beta over next-states back to s,
    # Pp[j] maps alpha over states to each target's j-th predecessor.
    Pn = np.zeros((I, S, S), np.float32)
    Pp = np.zeros((I, S, S), np.float32)
    for u in range(I):
        Pn[u, nst_np[:, u], np.arange(S)] = 1.0
        Pp[u, ps_np[:, u], np.arange(S)] = 1.0
    Pn = jnp.asarray(Pn)
    Pp = jnp.asarray(Pp)

    def permute(vec, P_u):
        # vec [B, S] -> vec[table[s]] as a matmul
        return jax.lax.dot_general(
            vec, P_u, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Branch log-probs WITHOUT priors (reference keeps priors separate,
    # turbo.py:100-110): lg[b, t, s, u]
    x = sys_symbols[..., None, None] - out_cs  # [B,T,S,I]
    y = par_symbols[..., None, None] - out_cp
    lgamma = -(x * x + y * y) / (2.0 * noise_variance)

    # Log-priors from intrinsic LLRs (turbo.py:238-240):
    lp1 = -jax.nn.softplus(-L_int)  # log p(u=1)
    lp0 = -jax.nn.softplus(L_int)  # log p(u=0)
    lp = jnp.stack([lp0, lp1], axis=-1)  # [B, T, 2]

    lg_priored = lgamma + lp[:, :, None, :]  # [B,T,S,I]

    # Predecessor-ordered branch log-probs, built by evaluating the model
    # on reordered CONSTANT tables (no gather): entry [b,t,s',j] is the
    # branch (pred_state[s',j] --pred_input[s',j]--> s').
    cs_re = jnp.asarray(cs_np[ps_np, pu_np])  # [S, I] constants
    cp_re = jnp.asarray(cp_np[ps_np, pu_np])
    pu_is1 = jnp.asarray(pu_np == 1)
    xr = sys_symbols[..., None, None] - cs_re
    yr = par_symbols[..., None, None] - cp_re
    lg_re = -(xr * xr + yr * yr) / (2.0 * noise_variance)
    lgp_re = lg_re + jnp.where(
        pu_is1, lp1[..., None, None], lp0[..., None, None]
    )

    # ---- backward recursion (turbo.py:78-111), log domain ----
    def bwd(beta_next, lg_t):
        # beta[s] = LSE_u(beta_next[ns[s,u]] + lg_t[s,u])
        acc = permute(beta_next, Pn[0]) + lg_t[..., 0]
        for u in range(1, I):
            acc = lse2(acc, permute(beta_next, Pn[u]) + lg_t[..., u])
        beta = acc - lseS(acc, -1)[..., None]
        return beta, beta_next

    beta_T = jnp.zeros((B, S), jnp.float32)
    _, betas = jax.lax.scan(
        bwd, beta_T, jnp.moveaxis(lg_priored, 1, 0), reverse=True, unroll=8
    )
    # betas[t] = beta_{t+1} (the value consumed by the APP at step t)
    betas = jnp.moveaxis(betas, 0, 1)  # [B, T, S]

    # ---- forward recursion + APP (turbo.py:114-158), log domain ----
    alpha0 = jnp.where(
        jnp.arange(S)[None, :] == 0, 0.0, neg_inf
    ) * jnp.ones((B, 1))

    def fwd(alpha, inputs):
        lg_t, lgp_re_t, beta_next = inputs
        # APP over branches grouped by input u (no prior on current step):
        app = jnp.stack(
            [
                lseS(
                    alpha + lg_t[..., u] + permute(beta_next, Pn[u]), -1
                )
                for u in range(I)
            ],
            axis=-1,
        )  # [B, I]
        # alpha update through the priors, predecessor-ordered branches:
        acc = permute(alpha, Pp[0]) + lgp_re_t[..., 0]
        for j in range(1, I):
            acc = lse2(acc, permute(alpha, Pp[j]) + lgp_re_t[..., j])
        alpha_next = acc - lseS(acc, -1)[..., None]
        return alpha_next, app

    _, apps = jax.lax.scan(
        fwd,
        alpha0,
        (
            jnp.moveaxis(lgamma, 1, 0),
            jnp.moveaxis(lgp_re, 1, 0),
            jnp.moveaxis(betas, 1, 0),
        ),
        unroll=8,
    )
    apps = jnp.moveaxis(apps, 0, 1)  # [B, T, 2]
    lappr = L_int + apps[..., 1] - apps[..., 0]
    decoded = (lappr > 0).astype(jnp.int8) if compute_decode else None
    return lappr, decoded


@partial(jax.jit,
         static_argnames=("trellis", "compute_decode", "max_log"))
def _log_bcjr_parallel(
    sys_symbols, par_symbols, L_int, noise_variance, trellis: Trellis,
    compute_decode: bool = True, max_log: bool = False,
):
    """BCJR with O(log T) sequential depth via `associative_scan`.

    The alpha/beta recursions are chains of log-semiring (logsumexp, +)
    matrix-vector products; composing the [S, S] transition matrices with
    a parallel prefix turns 2T dependent steps into ~2 log2 T rounds of
    batched "log-matmuls".  For the tiny state counts of turbo component
    codes this is the difference between a latency-bound scan and full
    device utilization — the TPU-native BCJR (used by the turbo link
    models; the sequential `_log_bcjr` remains the bit-faithful default
    of the compat API).
    """
    B, T = sys_symbols.shape
    nst_np, cs_np, cp_np, _, _ = _bcjr_tables_np(trellis)
    nst = jnp.asarray(nst_np)
    out_cs = jnp.asarray(cs_np)
    out_cp = jnp.asarray(cp_np)
    S = nst_np.shape[0]
    neg_inf = jnp.float32(-3e37)
    lse = (lambda x, axis: jnp.max(x, axis=axis)) if max_log \
        else jax.nn.logsumexp

    x = sys_symbols[..., None, None] - out_cs
    y = par_symbols[..., None, None] - out_cp
    lgamma = -(x * x + y * y) / (2.0 * noise_variance)
    lp1 = -jax.nn.softplus(-L_int)
    lp0 = -jax.nn.softplus(L_int)
    lp = jnp.stack([lp0, lp1], axis=-1)
    lg_priored = lgamma + lp[:, :, None, :]  # [B,T,S,I]

    # Transition matrices M[b,t,s,s'] = lg_priored[b,t,s,u] for ns[s,u]==s',
    # built by mask-select (edge one-hots; scatters are slow on TPU).
    s_next = jnp.arange(S)[None, :]
    M = jnp.full((B, T, S, S), neg_inf)
    for u in range(nst.shape[1]):
        onehot_u = nst[:, u][:, None] == s_next  # [S, S] static-ish bool
        M = jnp.where(onehot_u, lg_priored[:, :, :, u][..., None], M)

    def logmm(a, b):
        # c[i,j] = LSE_k a[i,k] + b[k,j], renormalized per matrix
        c = lse(a[..., :, :, None] + b[..., None, :, :], -2)
        return c - jnp.max(c, axis=(-2, -1), keepdims=True)

    # alpha_t = alpha_0 (x) M_1 (x) ... (x) M_t  -> prefix products of M
    P = jax.lax.associative_scan(logmm, M, axis=1)
    alpha0 = jnp.full((B, S), neg_inf).at[:, 0].set(0.0)
    alphas_tail = lse(alpha0[:, None, :, None] + P, -2)  # [B,T,S] = alpha_t
    alphas = jnp.concatenate(
        [jnp.broadcast_to(alpha0[:, None], (B, 1, S)), alphas_tail[:, :-1]],
        axis=1,
    )  # alpha_{t-1} consumed by the APP at step t

    # beta_pos[i] = M_i (x) ... (x) M_{T-1} (x) beta_T.  Matrix products
    # don't commute, so the suffix products are computed as a FORWARD
    # prefix scan over the time-reversed, transposed matrices:
    # (M_{T-1}^T (x) ... (x) M_i^T) = (M_i (x) ... (x) M_{T-1})^T.
    Mrt = jnp.flip(jnp.swapaxes(M, -1, -2), axis=1)
    R = jax.lax.associative_scan(logmm, Mrt, axis=1)
    beta_T = jnp.zeros((B, S))
    # flip(R)[i] = Q_i^T, so (Q_i . beta)[s] = LSE_j Q_i^T[j, s] + beta[j]
    betas_pos = lse(jnp.flip(R, axis=1) + beta_T[:, None, :, None], -2)
    # betas_pos[i] = beta at position i; APP at step i needs beta_{i+1}:
    betas = jnp.concatenate(
        [betas_pos[:, 1:], jnp.broadcast_to(beta_T[:, None], (B, 1, S))],
        axis=1,
    )

    app = lse(alphas[..., None] + lgamma + betas[:, :, nst], axis=2)
    # [B, T, I]
    lappr = L_int + app[..., 1] - app[..., 0]
    decoded = (lappr > 0).astype(jnp.int8) if compute_decode else None
    return lappr, decoded


def _bcjr_tables_np(trellis: Trellis):
    """Host constant tables: (nst, cs, cp, pred_state, pred_input)."""
    nst = trellis.next_state_table.astype(np.int32)
    bits = np_unpack_bits(trellis.output_table, trellis.n)  # [S, I, n]
    cs = (2.0 * bits[..., 0] - 1.0).astype(np.float32)
    cp = (2.0 * bits[..., 1] - 1.0).astype(np.float32)
    return (nst, cs, cp, trellis.pred_state_table,
            trellis.pred_input_table)


@partial(jax.jit, static_argnames=("trellis", "compute_decode", "max_log",
                                   "chunk", "warmup"))
def _log_bcjr_windowed(
    sys_symbols,  # [B, T]
    par_symbols,  # [B, T]
    L_int,  # [B, T]
    noise_variance,
    trellis: Trellis,
    compute_decode: bool = True,
    max_log: bool = False,
    chunk: int = 256,
    warmup: int = 32,
):
    """Sliding-window BCJR: sub-blocks with state-metric warmup halos.

    The exact BCJR's 2T-step sequential chain (`_log_bcjr`) is latency-
    bound on TPU — each step is a handful of tiny [B, S] ops.  This
    variant decodes the frame as ``N = ceil(T/chunk)`` sub-blocks IN
    PARALLEL (folded into the batch axis); each sub-block's alpha/beta
    recursions start from a uniform metric ``warmup`` symbols before/
    after its core region, the classic sliding-window approximation used
    by hardware turbo decoders.  Sequential depth drops from 2T to
    2(chunk + 2 warmup); a few constraint-lengths of warmup make the
    extrinsic outputs indistinguishable from the full recursion at
    link-level BER.

    Chunk 0's alpha starts exactly at state 0 and the final chunk's beta
    is exactly uniform (= the reference's termination handling,
    turbo.py:84/120), enforced by masking out-of-frame window positions
    so recursions pass through them unchanged.
    """
    B, T = sys_symbols.shape
    C, W = int(chunk), int(warmup)
    Tp = -(-T // C) * C
    N = Tp // C
    Wn = W + C + W

    def windows(x):
        # [B, T] -> [B*N, Wn]: chunk cores with W-symbol halos each side
        xp = jnp.pad(x, ((0, 0), (0, Tp - T)))
        xc = xp.reshape(B, N, C)
        left = jnp.pad(xc[:, :-1, C - W:], ((0, 0), (1, 0), (0, 0)))
        right = jnp.pad(xc[:, 1:, :W], ((0, 0), (0, 1), (0, 0)))
        return jnp.concatenate([left, xc, right], -1).reshape(B * N, Wn)

    sy = windows(sys_symbols)
    pa = windows(par_symbols)
    li = windows(L_int)
    gpos = jnp.arange(N)[:, None] * C - W + jnp.arange(Wn)[None, :]
    valid = jnp.broadcast_to(
        ((gpos >= 0) & (gpos < T))[None], (B, N, Wn)
    ).reshape(B * N, Wn)
    first = jnp.broadcast_to(
        (jnp.arange(N) == 0)[None], (B, N)
    ).reshape(B * N)

    apps = _bcjr_masked(sy, pa, li, noise_variance, trellis, valid, first,
                        max_log)
    core = apps.reshape(B, N, Wn, 2)[:, :, W:W + C, :].reshape(B, Tp, 2)
    core = core[:, :T]
    lappr = L_int + core[..., 1] - core[..., 0]
    decoded = (lappr > 0).astype(jnp.int8) if compute_decode else None
    return lappr, decoded


def _bcjr_masked(sy, pa, li, noise_variance, trellis: Trellis, valid, first,
                 max_log: bool, alpha_init=None, beta_init=None,
                 return_carries: bool = False):
    """Masked log-BCJR over arbitrary windows: the shared core of the
    sliding-window decoder and the mesh-sharded stream decoder.

    sy/pa/li: ``[R, Wn]`` windows; ``valid [R, Wn]`` marks in-frame
    positions (recursions pass through masked ones unchanged);
    ``first [R]`` selects the exact state-0 alpha start.  Returns APP
    log-probs ``[R, Wn, 2]`` (no priors on the decision step).

    ``alpha_init`` / ``beta_init`` ``[R, S]`` override the start metrics
    (NII boundary handoff); with ``return_carries`` the final
    (per-step-normalized) alpha and backward-final beta come back too:
    ``(apps, alpha_fin, beta_fin)``.
    """
    nst_np, cs_np, cp_np, ps_np, pu_np = _bcjr_tables_np(trellis)
    S, I = nst_np.shape
    R = sy.shape[0]
    neg_inf = jnp.float32(-1e30)
    lse2 = (jnp.maximum if max_log else jnp.logaddexp)
    lseS = (
        (lambda x, axis: jnp.max(x, axis=axis)) if max_log
        else jax.nn.logsumexp
    )

    # One-hot permutations (as in _log_bcjr)
    Pn = np.zeros((I, S, S), np.float32)
    Pp = np.zeros((I, S, S), np.float32)
    for u in range(I):
        Pn[u, nst_np[:, u], np.arange(S)] = 1.0
        Pp[u, ps_np[:, u], np.arange(S)] = 1.0
    Pn = jnp.asarray(Pn)
    Pp = jnp.asarray(Pp)

    def permute(vec, P_u):
        return jax.lax.dot_general(
            vec, P_u, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Branch metrics are (re)computed INSIDE the scan bodies from the
    # [R]-sized symbol rows — the [R, Wn, S, I] branch tensors of the
    # exact path would dominate HBM traffic at long frames (25x the
    # stream size), while the per-step broadcast against the [S, I]
    # constant tables is a handful of VPU ops.
    out_cs = jnp.asarray(cs_np)
    out_cp = jnp.asarray(cp_np)
    cs_re = jnp.asarray(cs_np[ps_np, pu_np])
    cp_re = jnp.asarray(cp_np[ps_np, pu_np])
    pu_is1 = jnp.asarray(pu_np == 1)
    inv2nv = 1.0 / (2.0 * noise_variance)

    def lgamma_t(sy_t, pa_t):
        x = sy_t[:, None, None] - out_cs
        y = pa_t[:, None, None] - out_cp
        return -(x * x + y * y) * inv2nv  # [R, S, I]

    def priors_t(li_t):
        return -jax.nn.softplus(li_t), -jax.nn.softplus(-li_t)  # lp0, lp1

    def lgp_re_t(sy_t, pa_t, li_t):
        xr = sy_t[:, None, None] - cs_re
        yr = pa_t[:, None, None] - cp_re
        lp0, lp1 = priors_t(li_t)
        return -(xr * xr + yr * yr) * inv2nv + jnp.where(
            pu_is1, lp1[:, None, None], lp0[:, None, None]
        )

    # ---- masked backward recursion ----
    def bwd(beta_next, inp):
        sy_t, pa_t, li_t, valid_t = inp
        lp0, lp1 = priors_t(li_t)
        lg_t = lgamma_t(sy_t, pa_t) + jnp.stack(
            [lp0, lp1], -1
        )[:, None, :]
        acc = permute(beta_next, Pn[0]) + lg_t[..., 0]
        for u in range(1, I):
            acc = lse2(acc, permute(beta_next, Pn[u]) + lg_t[..., u])
        beta = acc - lseS(acc, -1)[..., None]
        beta = jnp.where(valid_t[:, None], beta, beta_next)
        return beta, beta_next

    beta_T = (jnp.zeros((R, S), jnp.float32) if beta_init is None
              else jnp.asarray(beta_init, jnp.float32))
    beta_fin, betas = jax.lax.scan(
        bwd, beta_T,
        (sy.T, pa.T, li.T, valid.T),
        reverse=True, unroll=8,
    )
    betas = jnp.moveaxis(betas, 0, 1)  # [R, Wn, S] = beta_{t+1}

    # ---- masked forward recursion + APP ----
    if alpha_init is None:
        alpha0 = jnp.where(
            first[:, None],
            jnp.where(jnp.arange(S)[None, :] == 0, 0.0, neg_inf),
            0.0,
        )
    else:
        alpha0 = jnp.asarray(alpha_init, jnp.float32)

    def fwd(alpha, inputs):
        sy_t, pa_t, li_t, beta_next, valid_t = inputs
        lg_t = lgamma_t(sy_t, pa_t)
        app = jnp.stack(
            [
                lseS(alpha + lg_t[..., u] + permute(beta_next, Pn[u]), -1)
                for u in range(I)
            ],
            axis=-1,
        )
        lgp_t = lgp_re_t(sy_t, pa_t, li_t)
        acc = permute(alpha, Pp[0]) + lgp_t[..., 0]
        for j in range(1, I):
            acc = lse2(acc, permute(alpha, Pp[j]) + lgp_t[..., j])
        alpha_next = acc - lseS(acc, -1)[..., None]
        alpha_next = jnp.where(valid_t[:, None], alpha_next, alpha)
        return alpha_next, app

    alpha_fin, apps = jax.lax.scan(
        fwd,
        alpha0,
        (sy.T, pa.T, li.T, jnp.moveaxis(betas, 1, 0), valid.T),
        unroll=8,
    )
    apps_out = jnp.moveaxis(apps, 0, 1)  # [R, Wn, 2]
    if return_carries:
        return apps_out, alpha_fin, beta_fin
    return apps_out


def map_decode_device(sys_symbols, non_sys_symbols, trellis: Trellis,
                      noise_variance, L_int, algorithm="log-MAP"):
    """Batched log-MAP decode of one rate-1/2 RSC stream.

    sys_symbols, non_sys_symbols, L_int: ``[..., T]``.
    Returns (L_ext ``[..., T]``, decoded_bits int8 ``[..., T]``).
    """
    sy = jnp.atleast_2d(jnp.asarray(sys_symbols, jnp.float32))
    pa = jnp.atleast_2d(jnp.asarray(non_sys_symbols, jnp.float32))
    li = jnp.atleast_2d(jnp.asarray(L_int, jnp.float32))
    lappr, decoded = _log_bcjr(
        sy, pa, li, jnp.float32(noise_variance), trellis,
        max_log=(algorithm == "max-log"),
    )
    if jnp.ndim(jnp.asarray(sys_symbols)) == 1:
        return lappr[0], decoded[0]
    return lappr, decoded


def map_decode(sys_symbols, non_sys_symbols, trellis: Trellis,
               noise_variance, L_int, mode="decode"):
    """Reference-compatible MAP decoder (turbo.py:163-251)."""
    L_ext, decoded = map_decode_device(
        np.asarray(sys_symbols, float),
        np.asarray(non_sys_symbols, float),
        trellis,
        noise_variance,
        np.asarray(L_int, float),
    )
    return [np.asarray(L_ext), np.asarray(decoded).astype(int)]


@partial(jax.jit, static_argnames=("trellis", "number_iterations",
                                   "max_log", "parallel", "p_tuple",
                                   "window", "ext_scale"))
def _turbo_iterations(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                      noise_variance, p_tuple, L_int, trellis: Trellis,
                      number_iterations: int, max_log: bool = False,
                      parallel: bool = False, window=None,
                      ext_scale: float = 1.0):
    if window is not None:
        chunk, warmup = window
        bcjr = partial(_log_bcjr_windowed, chunk=chunk, warmup=warmup)
    elif parallel:
        bcjr = _log_bcjr_parallel
    else:
        bcjr = _log_bcjr
    p_np = np.asarray(p_tuple, np.int64)
    L = p_np.shape[0]
    inv_np = np.empty_like(p_np)
    inv_np[p_np] = np.arange(L)

    if L <= 2048:
        # Permutations as one-hot matmuls: gathers inside the iteration
        # scan lower to scalar loops on TPU. Pi[i, j] = 1 iff p[j] == i,
        # so (x @ Pi)[j] = x[p[j]] (interleave); Pi^T deinterleaves.
        Pi = np.zeros((L, L), np.float32)
        Pi[p_np, np.arange(L)] = 1.0
        Pi = jnp.asarray(Pi)

        def interlv(x):
            return jax.lax.dot_general(
                x, Pi, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def deinterlv(x):
            return jax.lax.dot_general(
                x, Pi, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        # Large frames: dense [L, L] one-hots would be O(L^2) FLOPs per
        # exchange.  Permutation GATHERS are fine on TPU as standalone ops
        # — only gathers inside a scan body lower to scalar loops — so the
        # extrinsic loop is UNROLLED (n_iterations is static) and each
        # interleave is one constant-index gather at the XLA top level.
        p = jnp.asarray(p_np, jnp.int32)
        inv_p = jnp.asarray(inv_np, jnp.int32)
        interlv = lambda x: jnp.take(x, p, axis=-1)
        deinterlv = lambda x: jnp.take(x, inv_p, axis=-1)

    sys_i = interlv(sys_symbols)

    def body(L_int_1, _):
        L_ext_1, _ = bcjr(
            sys_symbols, non_sys_symbols_1, L_int_1,
            noise_variance, trellis, compute_decode=False, max_log=max_log,
        )
        L_ext_1 = L_ext_1 - L_int_1
        L_int_2 = interlv(L_ext_1 * ext_scale)
        L_2, _ = bcjr(
            sys_i, non_sys_symbols_2, L_int_2,
            noise_variance, trellis, compute_decode=False, max_log=max_log,
        )
        L_ext_2 = L_2 - L_int_2
        L_int_1 = deinterlv(L_ext_2 * ext_scale)
        return L_int_1, L_2

    if L <= 2048:
        L_int_1, L_2_all = jax.lax.scan(
            body, L_int, None, length=number_iterations
        )
        L_2_last = L_2_all[-1]
    else:  # unrolled: keeps the permutation gathers out of any scan body
        L_int_1 = L_int
        L_2_last = None
        for _ in range(number_iterations):
            L_int_1, L_2_last = body(L_int_1, None)
    # Deinterleave the posterior LLRs, then threshold — a permutation of
    # exact copies commutes with the sign decision, so this equals the
    # reference's deinterleave-of-bits (turbo.py:331).
    decoded = (deinterlv(L_2_last) > 0).astype(jnp.int8)
    return decoded



@partial(jax.jit, static_argnames=("trellis", "number_iterations",
                                   "max_log", "p_tuple", "chunk",
                                   "ext_scale"))
def _turbo_iterations_xla_nii(sys_symbols, non_sys_symbols_1,
                              non_sys_symbols_2, noise_variance, p_tuple,
                              L_int, trellis: Trellis,
                              number_iterations: int, chunk: int,
                              max_log: bool = False,
                              ext_scale: float = 1.0):
    """XLA twin of the pallas NII loop (window_init='nii').

    Windows are a plain reshape ([B, T] -> [B*N, C], batch-major rows),
    so the interleaver exchange stays a [B, T]-level gather; boundary
    alpha/beta carries shift one window per iteration along the N axis.
    `_bcjr_masked` normalizes metrics per step, so the carried states
    need no renormalization.
    """
    p_np = np.asarray(p_tuple, np.int64)
    L = p_np.shape[0]
    if L % chunk:
        raise ValueError(
            f"window_init='nii' needs chunk {chunk} to divide the frame "
            f"length {L}"
        )
    inv_np = np.empty_like(p_np)
    inv_np[p_np] = np.arange(L)
    B = sys_symbols.shape[0]
    C = int(chunk)
    N = L // C
    R = B * N
    S = trellis.number_states
    nv = jnp.float32(noise_variance)
    p = jnp.asarray(p_np, jnp.int32)
    inv_p = jnp.asarray(inv_np, jnp.int32)

    win = lambda x: x.reshape(R, C)
    unwin = lambda x: x.reshape(B, L)
    interlv = lambda x: jnp.take(x, p, axis=1)
    deinterlv = lambda x: jnp.take(x, inv_p, axis=1)

    sy_w = win(sys_symbols)
    pa1_w = win(non_sys_symbols_1)
    sy_i = interlv(sys_symbols)
    syi_w = win(sy_i)
    pa2_w = win(non_sys_symbols_2)
    valid_all = jnp.ones((R, C), bool)
    first = jnp.zeros((R,), bool)  # alpha_init supersedes it

    exact = jnp.where(jnp.arange(S)[None, :] == 0, 0.0,
                      jnp.float32(-1e30))  # [1, S]
    a_init3 = jnp.broadcast_to(
        jnp.where((jnp.arange(N) == 0)[None, :, None], exact[:, None, :],
                  0.0),
        (B, N, S),
    )
    a01 = a02 = a_init3.reshape(R, S)
    bt1 = bt2 = jnp.zeros((R, S), jnp.float32)

    def shift_states(af, bf):
        af3 = af.reshape(B, N, S)
        bf3 = bf.reshape(B, N, S)
        a0 = jnp.concatenate(
            [jnp.broadcast_to(exact[:, None, :], (B, 1, S)),
             af3[:, :N - 1]], axis=1).reshape(R, S)
        bT = jnp.concatenate(
            [bf3[:, 1:], jnp.zeros((B, 1, S), jnp.float32)],
            axis=1).reshape(R, S)
        return a0, bT

    li = L_int
    li2 = diff2 = None
    for _ in range(int(number_iterations)):
        apps1, af1, bf1 = _bcjr_masked(
            sy_w, pa1_w, win(li), nv, trellis, valid_all, first, max_log,
            alpha_init=a01, beta_init=bt1, return_carries=True)
        a01, bt1 = shift_states(af1, bf1)
        ext1 = unwin(apps1[..., 1] - apps1[..., 0])
        li2 = interlv(ext1 * ext_scale)
        apps2, af2, bf2 = _bcjr_masked(
            syi_w, pa2_w, win(li2), nv, trellis, valid_all, first,
            max_log, alpha_init=a02, beta_init=bt2, return_carries=True)
        a02, bt2 = shift_states(af2, bf2)
        diff2 = unwin(apps2[..., 1] - apps2[..., 0])
        li = deinterlv(diff2 * ext_scale)
    return (deinterlv(li2 + diff2) > 0).astype(jnp.int8)


@partial(jax.jit, static_argnames=("trellis", "number_iterations",
                                   "max_log", "p_tuple", "window",
                                   "lane_chunk", "io_dtype",
                                   "window_init", "ext_scale"))
def _turbo_iterations_pallas(sys_symbols, non_sys_symbols_1,
                             non_sys_symbols_2, noise_variance, p_tuple,
                             L_int, trellis: Trellis,
                             number_iterations: int, max_log: bool = False,
                             window=None, lane_chunk: int = 1024,
                             io_dtype: str = "f32",
                             window_init: str = "warmup",
                             ext_scale: float = 1.0):
    """Extrinsic loop driven by the fused Pallas BCJR kernel.

    Same math as `_turbo_iterations` (reference turbo.py:254-333), but
    each MAP pass is ONE kernel call (`kernels/bcjr.py`): the 2T-step
    recursion runs inside VMEM with the betas never leaving vector
    registers, instead of 2T XLA scan steps shuttling [B, S] tensors.
    Streams are transposed to batch-last [L, B] and noise-scaled once;
    the iteration loop is unrolled (static count) so each interleaver
    exchange is a constant-index gather at the XLA top level — gathers
    only lower to scalar loops INSIDE scan bodies.

    ``window=(chunk, warmup)`` folds the frame into ``N`` sub-blocks
    with warmup halos ON THE LANE AXIS ([L, B] -> [Wn, N*B]) and decodes
    every window of every frame simultaneously under the kernel's
    valid/first masks — the long-frame path (alpha history for a whole
    LTE frame would not fit VMEM).
    """
    p_np = np.asarray(p_tuple, np.int64)
    L = p_np.shape[0]
    inv_np = np.empty_like(p_np)
    inv_np[p_np] = np.arange(L)
    B = sys_symbols.shape[0]

    inv_nv = 1.0 / noise_variance
    sy = sys_symbols.T * inv_nv  # [L, B]
    pa1 = non_sys_symbols_1.T * inv_nv
    pa2 = non_sys_symbols_2.T * inv_nv
    li = L_int.T

    p = jnp.asarray(p_np, jnp.int32)
    inv_p = jnp.asarray(inv_np, jnp.int32)
    interlv = lambda x: jnp.take(x, p, axis=0)
    deinterlv = lambda x: jnp.take(x, inv_p, axis=0)
    sy_i = interlv(sy)

    if window is None:
        # whole-frame: precombine the w-streams ONCE (loop constants —
        # recombining them inside every MAP pass costs two full HBM
        # sweeps per pass) and exchange posteriors directly
        from ..kernels.bcjr import bcjr_appdiff_pallas

        w1, w2 = sy + pa1, sy - pa1
        w1i, w2i = sy_i + pa2, sy_i - pa2

        def bcjr_post(wa, wb, lint):
            return bcjr_appdiff_pallas(wa, wb, lint, trellis,
                                       max_log=max_log,
                                       io_dtype=io_dtype,
                                       combined=True, posterior=True)

        E2 = li2 = None
        for _ in range(number_iterations):
            E1 = bcjr_post(w1, w2, li)
            li2 = interlv((E1 - li) * ext_scale)
            E2 = bcjr_post(w1i, w2i, li2)
            li = deinterlv((E2 - li2) * ext_scale)
        # E2 IS decoder 2's posterior; the deinterleave of exact copies
        # commutes with the sign decision (turbo.py:331)
        decoded = (deinterlv(E2) > 0).astype(jnp.int8)
        return decoded.T
    elif window_init == "nii":
        # Next-Iteration Initialization: windows have NO warmup halos;
        # each MAP pass starts its alpha/beta from the boundary metrics
        # its neighbors produced on the PREVIOUS turbo iteration (the
        # standard hardware sliding-window scheme).  Kills the halo
        # recompute AND the masked valid stream, and the per-pass
        # sequential depth is 2C, not 2(C + 2W).
        from ..kernels.bcjr import bcjr_appdiff_pallas

        C = int(window[0])
        if L % C:
            raise ValueError(
                f"window_init='nii' needs chunk {C} to divide the frame "
                f"length {L} (pad the frame or use window_init='warmup')"
            )
        N = L // C
        R = N * B
        S = trellis.number_states

        def fold0(x):  # [L, B] -> [C, N*B], window-major columns
            return jnp.transpose(
                x.reshape(N, C, B), (1, 0, 2)).reshape(C, R)

        def unfold0(e):  # inverse of fold0
            return jnp.transpose(
                e.reshape(C, N, B), (1, 0, 2)).reshape(L, B)

        def make_refold(perm_np):
            # fold0(perm(unfold0(e))) as ONE static row gather
            g = (np.arange(N)[None, :] * C
                 + np.arange(C)[:, None])  # [C, N]
            src = perm_np[g]
            flat = (src % C) * N + src // C
            idx = jnp.asarray(flat.reshape(-1), jnp.int32)

            def refold(e_f):
                rows = jnp.take(e_f.reshape(C * N, B), idx, axis=0)
                return rows.reshape(C, R)

            return refold

        refold_p = make_refold(p_np)
        refold_ip = make_refold(inv_np)
        w1_f, w2_f = fold0(sy + pa1), fold0(sy - pa1)
        w1i_f, w2i_f = fold0(sy_i + pa2), fold0(sy_i - pa2)

        exact_np = np.zeros((S, B), np.float32)
        exact_np[1:, :] = -1e30  # frame start: encoder state 0
        exact = jnp.asarray(exact_np)
        a0_init = jnp.concatenate(
            [exact, jnp.zeros((S, R - B), jnp.float32)], axis=1)
        bT_init = jnp.zeros((S, R), jnp.float32)

        def shift_states(af, bf):
            # window n's next alpha start = window n-1's final alpha;
            # window 0 keeps the exact frame-start metric.  Beta flows
            # the other way; the last window stays uniform (frames are
            # unterminated, matching the whole-frame kernel).  Metrics
            # are unnormalized — renormalize per lane so the drift
            # cannot accumulate across iterations.
            a0 = jnp.concatenate([exact, af[:, :R - B]], axis=1)
            bT = jnp.concatenate(
                [bf[:, B:], jnp.zeros((S, B), jnp.float32)], axis=1)
            a0 = a0 - jnp.max(a0, axis=0, keepdims=True)
            bT = bT - jnp.max(bT, axis=0, keepdims=True)
            return a0, bT

        def kernel_b(wa_f, wb_f, lint_f, a0, bT):
            return bcjr_appdiff_pallas(
                wa_f, wb_f, lint_f, trellis, max_log=max_log,
                io_dtype=io_dtype, boundary=(a0, bT),
                combined=True, posterior=True)

        a01, bt1 = a0_init, bT_init
        a02, bt2 = a0_init, bT_init
        li_f = fold0(li)
        E2_f = None
        for _ in range(number_iterations):
            E1_f, af1, bf1 = kernel_b(w1_f, w2_f, li_f, a01, bt1)
            a01, bt1 = shift_states(af1, bf1)
            li2_f = refold_p((E1_f - li_f) * ext_scale)
            E2_f, af2, bf2 = kernel_b(w1i_f, w2i_f, li2_f, a02, bt2)
            a02, bt2 = shift_states(af2, bf2)
            li_f = refold_ip((E2_f - li2_f) * ext_scale)
        decoded = (deinterlv(unfold0(E2_f)) > 0).astype(jnp.int8)
        return decoded.T
    else:
        C, W = int(window[0]), int(window[1])
        Tp = -(-L // C) * C
        N = Tp // C
        Wn = W + C + W

        def fold(x):  # [L, B] -> [Wn, N*B] window cores + W halos
            xc = jnp.pad(x, ((0, Tp - L), (0, 0))).reshape(N, C, B)
            left = jnp.pad(xc[:-1, C - W:], ((1, 0), (0, 0), (0, 0)))
            right = jnp.pad(xc[1:, :W], ((0, 1), (0, 0), (0, 0)))
            xw = jnp.concatenate([left, xc, right], 1)  # [N, Wn, B]
            return jnp.moveaxis(xw, 0, 1).reshape(Wn, N * B)

        def unfold(e):  # [Wn, N*B] -> [L, B] core regions
            core = e[W:W + C].reshape(C, N, B)
            return jnp.moveaxis(core, 1, 0).reshape(N * C, B)[:L]

        gpos = np.arange(N)[:, None] * C - W + np.arange(Wn)[None, :]
        valid_np = (gpos >= 0) & (gpos < L)  # [N, Wn]
        valid = jnp.broadcast_to(
            jnp.asarray(valid_np.T, jnp.float32)[:, :, None], (Wn, N, B)
        ).reshape(Wn, N * B)
        first = jnp.broadcast_to(
            jnp.asarray(np.arange(N) == 0)[:, None], (N, B)
        ).reshape(N * B)

        def kernel_f(wa_f, wb_f, lint_f):
            from ..kernels.bcjr import bcjr_appdiff_pallas
            return bcjr_appdiff_pallas(wa_f, wb_f, lint_f, trellis,
                                       max_log=max_log, valid=valid,
                                       first=first, io_dtype=io_dtype,
                                       combined=True, posterior=True)

        # Composite refold-after-permutation: fold(perm(unfold(e))) is
        # ONE static row gather of the folded [Wn, N*B] tensor (rows
        # flattened to [Wn*N, B]) instead of unfold + take + fold — one
        # HBM pass per half-iteration instead of three.
        def make_refold(perm_np):
            ok = valid_np.T  # [Wn, N]
            src = np.where(ok, perm_np[np.clip(gpos.T, 0, L - 1)], 0)
            flat = (W + src % C) * N + src // C  # row in [Wn*N, B]
            idx = jnp.asarray(flat.reshape(-1), jnp.int32)

            def refold(e_f):  # [Wn, N*B] -> [Wn, N*B], perm applied
                rows = jnp.take(e_f.reshape(Wn * N, B), idx, axis=0)
                return rows.reshape(Wn, N * B) * valid

            return refold

        refold_p = make_refold(p_np)
        refold_ip = make_refold(inv_np)

        w1_f, w2_f = fold(sy + pa1), fold(sy - pa1)
        w1i_f, w2i_f = fold(sy_i + pa2), fold(sy_i - pa2)

        E2_f = None
        li_f = fold(li)
        for _ in range(number_iterations):
            E1_f = kernel_f(w1_f, w2_f, li_f)
            li2_f = refold_p((E1_f - li_f) * ext_scale)
            E2_f = kernel_f(w1i_f, w2i_f, li2_f)
            li_f = refold_ip((E2_f - li2_f) * ext_scale)
        # E2_f IS decoder 2's posterior on the core regions (where
        # refold placed exact intrinsic copies); the deinterleave of
        # exact copies commutes with the sign decision (turbo.py:331).
        decoded = (deinterlv(unfold(E2_f)) > 0).astype(jnp.int8)
        return decoded.T



def _pallas_bcjr_fits(trellis: Trellis, win, window_init: str,
                      frame_len: int, kernel_io: str) -> bool:
    """Whether the fused BCJR kernel supports this configuration.

    Checks the trellis shape (binary input, power-of-two states,
    bijective per-input state maps) and the scoped-VMEM footprint of
    one kernel grid step (forward-metric history + double-buffered
    streams at the kernel's fixed 1024-lane granularity)."""
    from ..kernels.bcjr import _VMEM_BUDGET, _w_tables, bcjr_vmem_bytes

    S = trellis.number_states
    if trellis.number_inputs != 2 or (S & (S - 1)):
        return False
    try:
        _w_tables(trellis)
    except NotImplementedError:
        return False
    if win is None:
        Tk, masked = frame_len, False
    elif window_init == "nii":
        Tk, masked = win[0], False
    else:
        Tk, masked = win[0] + 2 * win[1], True
    io_bytes = 2 if kernel_io == "bf16" else 4
    return bcjr_vmem_bytes(Tk, S, io_bytes, masked) <= _VMEM_BUDGET


def turbo_decode_device(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                        trellis: Trellis, noise_variance, number_iterations,
                        p_array, L_int=None, algorithm="log-MAP",
                        parallel=False, window=None, backend="auto",
                        kernel_io: str = "f32",
                        window_init: str = "warmup",
                        ext_scale: float = 1.0):
    """Batched turbo decode (extrinsic loop of turbo.py:254-333).

    All symbol arrays ``[..., T]``; p_array the interleaver permutation.
    ``parallel=True`` uses the associative-scan BCJR
    (O(log T) sequential depth) — profitable for small batches where the
    recursion is latency-bound; at large Monte-Carlo batches the
    sequential scan is bandwidth-optimal and is the default.
    ``window=(chunk, warmup)`` switches to the sliding-window BCJR:
    sub-blocks decoded in parallel with state-metric warmup halos — the
    high-throughput path for long frames (sequential depth
    2(chunk + 2 warmup) instead of 2T).
    ``backend``: "pallas" runs each MAP pass as ONE fused VMEM-resident
    kernel (`kernels/bcjr.py`); "xla" keeps the lax.scan core; "auto"
    picks pallas on TPU backends for binary trellises whenever the
    frame fits the kernel's VMEM budget (see
    :func:`kernels.bcjr.bcjr_vmem_bytes` — whole frames up to ~280
    symbols at 4 states in f32, ~2x that in bf16; any length windowed),
    xla otherwise.
    ``kernel_io``: "bf16" moves the Pallas kernel's symbol/extrinsic
    streams across HBM and holds them in VMEM in bfloat16 — half the
    stream footprint per MAP pass at the cost of quantizing LLRs to an
    8-bit mantissa (production hardware runs 4-6 bit LLRs; BER impact
    is below Monte-Carlo noise on the real chip, see
    scripts/turbo_ber_probe.py).  Fastest measured long-frame config:
    ``window=(128, 0), window_init="nii", kernel_io="bf16"``
    (scripts/turbo_window_ab.py).
    ``window_init``: "warmup" re-acquires window boundary states every
    MAP pass from W-step halos; "nii" (chunk must divide the frame)
    carries each window's boundary alpha/beta from the PREVIOUS turbo
    iteration instead — no halo recompute, no mask stream, per-pass
    depth 2C instead of 2(C+2W); the warmup value of ``window`` is
    ignored.  Available on both backends.
    ``ext_scale``: extrinsic scaling factor (Vogt & Finger 2000) applied
    to the LLRs exchanged between the two MAP decoders; ~0.7 recovers
    most of max-log-MAP's loss vs full log-MAP by damping its
    overconfident extrinsics.  1.0 (default) is the reference's
    unscaled exchange exactly (turbo.py:312-329).
    """
    sy = jnp.atleast_2d(jnp.asarray(sys_symbols, jnp.float32))
    p1 = jnp.atleast_2d(jnp.asarray(non_sys_symbols_1, jnp.float32))
    p2 = jnp.atleast_2d(jnp.asarray(non_sys_symbols_2, jnp.float32))
    if L_int is None:
        L_int = jnp.zeros_like(sy)
    else:
        L_int = jnp.atleast_2d(jnp.asarray(L_int, jnp.float32))
    p_tuple = tuple(int(v) for v in np.asarray(p_array))
    win = None if window is None else (int(window[0]), int(window[1]))
    if win is not None and win[1] > win[0]:
        raise ValueError(
            f"window warmup {win[1]} exceeds chunk {win[0]}; the halo "
            "fold needs warmup <= chunk"
        )
    if backend == "auto":
        fits = _pallas_bcjr_fits(trellis, win, window_init,
                                 len(p_tuple), kernel_io)
        backend = (
            "pallas"
            if (jax.default_backend() in ("tpu", "axon") and not parallel
                and fits)
            else "xla"
        )
    if window_init not in ("warmup", "nii"):
        raise ValueError('window_init must be "warmup" or "nii"')
    if window_init == "nii" and win is None:
        raise ValueError("window_init='nii' requires window=(chunk, _)")
    if window_init == "nii" and backend == "xla":
        out = _turbo_iterations_xla_nii(
            sy, p1, p2, jnp.float32(noise_variance), p_tuple, L_int,
            trellis, int(number_iterations), int(win[0]),
            algorithm == "max-log", ext_scale=float(ext_scale),
        )
        if jnp.ndim(jnp.asarray(sys_symbols)) == 1:
            return out[0]
        return out
    if backend == "pallas":
        out = _turbo_iterations_pallas(
            sy, p1, p2, jnp.float32(noise_variance), p_tuple, L_int,
            trellis, int(number_iterations), algorithm == "max-log", win,
            io_dtype=kernel_io, window_init=window_init,
            ext_scale=float(ext_scale),
        )
    else:
        out = _turbo_iterations(
            sy, p1, p2, jnp.float32(noise_variance), p_tuple, L_int,
            trellis, int(number_iterations), algorithm == "max-log",
            bool(parallel), win, ext_scale=float(ext_scale),
        )
    if jnp.ndim(jnp.asarray(sys_symbols)) == 1:
        return out[0]
    return out


def turbo_decode(sys_symbols, non_sys_symbols_1, non_sys_symbols_2,
                 trellis: Trellis, noise_variance, number_iterations,
                 interleaver, L_int=None):
    """Reference-compatible turbo decoder (turbo.py:254-333)."""
    out = turbo_decode_device(
        np.asarray(sys_symbols, float),
        np.asarray(non_sys_symbols_1, float),
        np.asarray(non_sys_symbols_2, float),
        trellis,
        noise_variance,
        number_iterations,
        interleaver.p_array,
        L_int,
    )
    return np.asarray(out).astype(int)
