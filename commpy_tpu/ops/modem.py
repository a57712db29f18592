"""Constellation mapping / demapping kernels.

TPU-native replacement for the reference Modem (commpy/modulation.py:39-262):

* constellation tables are built ONCE on the host (Gray reordering is the
  closed form ``i ^ (i >> 1)`` instead of the reference's sympy GrayCode
  argsort, commpy/modulation.py:71-75 — identical result);
* ``modulate`` is a batched gather (vs. the reference's ``np.vectorize``
  per-symbol closure, modulation.py:93-96);
* ``demodulate_hard`` is a distance-matrix argmin with NumPy's
  first-index tie-break (modulation.py:121-123);
* ``demodulate_soft`` is the exact-LLR computation (modulation.py:125-137)
  as one ``[batch, sym, const]`` logsumexp reduction — numerically robust
  where the reference's raw exp ratio under/overflows;
* ``demodulate_maxlog`` is the max-log approximation of the same quantity.

All kernels take the constellation as a device array argument so one jitted
program serves every modem; bit counts are static Python ints.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import pack_bits, unpack_bits

__all__ = [
    "gray_reorder",
    "psk_constellation",
    "qam_constellation",
    "modulate",
    "demodulate_hard",
    "demodulate_soft",
    "demodulate_maxlog",
    "constellation_bit_masks",
]


# --------------------------------------------------------------------------
# Host-side constellation construction
# --------------------------------------------------------------------------

def gray_reorder(points) -> np.ndarray:
    """Reorder ``points`` so index == bit pattern under Gray labelling.

    Equivalent to reference modulation.py:71-75: with g[i] = i ^ (i >> 1),
    new[g[i]] = old[i].
    """
    pts = np.asarray(points)
    m = pts.size
    g = np.arange(m) ^ (np.arange(m) >> 1)
    out = np.empty_like(pts)
    out[g] = pts
    return out


def psk_constellation(m: int) -> np.ndarray:
    """Gray-labelled m-PSK constellation (reference modulation.py:175-211)."""
    if 2 ** int(np.log2(m)) != m:
        raise ValueError("Constellation length must be a power of 2.")
    pts = np.exp(1j * np.arange(0, 2 * np.pi, 2 * np.pi / m))
    return gray_reorder(pts)


def qam_constellation(m: int) -> np.ndarray:
    """Gray-labelled square m-QAM constellation (reference modulation.py:213-262)."""
    num_symb_pam = np.sqrt(m)
    if num_symb_pam != int(num_symb_pam):
        raise ValueError("m must lead to a square QAM.")
    num_symb_pam = int(num_symb_pam)
    pam = np.arange(-num_symb_pam + 1, num_symb_pam, 2)
    pts = (
        np.tile(np.hstack((pam, pam[::-1])), num_symb_pam // 2) * 1j
        + pam.repeat(num_symb_pam)
    )
    return gray_reorder(pts)


def constellation_bit_masks(m: int, bps: int) -> np.ndarray:
    """``masks[p, c] = 1`` iff output bit position p of constellation index c is 1.

    Output bit position p corresponds to index bit (bps-1-p): the reference
    writes LLR for index-bit ``bit_index`` at output position
    ``bps-1-bit_index`` (modulation.py:137).
    """
    c = np.arange(m)
    p = np.arange(bps)
    bit_of_index = (c[None, :] >> (bps - 1 - p)[:, None]) & 1
    return bit_of_index.astype(np.bool_)


# --------------------------------------------------------------------------
# Device kernels (batched, jit-friendly)
# --------------------------------------------------------------------------

def modulate(bits, constellation, bits_per_symbol: int):
    """Map bits to constellation points.

    Parameters
    ----------
    bits : int array ``[..., n_bits]`` with n_bits % bits_per_symbol == 0
    constellation : complex array ``[m]``
    bits_per_symbol : static int

    Returns
    -------
    symbols : complex array ``[..., n_bits // bits_per_symbol]``
    """
    bits = jnp.asarray(bits)
    lead = bits.shape[:-1]
    grouped = bits.reshape(lead + (-1, bits_per_symbol))
    idx = pack_bits(grouped)
    return jnp.asarray(constellation)[idx]


def _sq_dists(symbols, constellation):
    """|y - c|^2 for every symbol/constellation pair: ``[..., n_sym, m]``."""
    y = jnp.asarray(symbols)[..., None]
    c = jnp.asarray(constellation)
    d = y - c
    return (d.real * d.real + d.imag * d.imag).astype(jnp.float32)


def demodulate_hard(symbols, constellation, bits_per_symbol: int):
    """Minimum-distance hard demapping.

    argmin keeps NumPy's first-index tie-break (reference modulation.py:122).
    Returns int8 bits ``[..., n_sym * bits_per_symbol]``.
    """
    idx = jnp.argmin(_sq_dists(symbols, constellation), axis=-1)
    bits = unpack_bits(idx, bits_per_symbol)
    lead = bits.shape[:-2]
    return bits.reshape(lead + (-1,))


_SEPARABLE_PLAN_CACHE = {}


def _separable_qam_plan(const_np, bps):
    """Per-axis factorization of a product-grid constellation, or None.

    For a full {Re levels} x {Im levels} grid where every bit's value
    depends on only ONE axis (true of Gray-labelled square QAM), the
    exact LLR factorizes: the other axis' logsumexp term is common to
    numerator and denominator and cancels.  Detected numerically from
    the concrete constellation, so any labelling that happens to be
    separable gets the fast path.
    """
    key = (const_np.tobytes(), bps)
    if key in _SEPARABLE_PLAN_CACHE:
        return _SEPARABLE_PLAN_CACHE[key]
    plan = None
    m = len(const_np)
    re = np.round(const_np.real.astype(np.float64), 9)
    im = np.round(const_np.imag.astype(np.float64), 9)
    uR, iR = np.unique(re, return_inverse=True)
    uI, iI = np.unique(im, return_inverse=True)
    if len(uR) * len(uI) == m and \
            len(np.unique(iR * len(uI) + iI)) == m:
        masks = constellation_bit_masks(m, bps)  # [bps, m]
        rows = []
        for p in range(bps):
            mk = masks[p]
            if all(len(set(mk[iR == g])) == 1 for g in range(len(uR))):
                rows.append(("I", np.array(
                    [mk[iR == g][0] for g in range(len(uR))])))
            elif all(len(set(mk[iI == g])) == 1 for g in range(len(uI))):
                rows.append(("Q", np.array(
                    [mk[iI == g][0] for g in range(len(uI))])))
            else:
                rows = None
                break
        if rows is not None:
            plan = (uR.astype(np.float32), uI.astype(np.float32), rows)
    _SEPARABLE_PLAN_CACHE[key] = plan
    return plan


def _resolve_separable(constellation, bits_per_symbol, method,
                       auto_min_order=64):
    """Shared method dispatch for the soft demappers: the separable plan
    to use, or None for the joint path.  Rejects unknown methods."""
    if method not in ("auto", "separable", "joint"):
        raise ValueError(
            f"method must be 'auto', 'separable', or 'joint', got "
            f"{method!r}")
    if method == "joint":
        return None
    try:
        const_np = np.asarray(constellation)
    except Exception:  # traced inside jit/vmap: no concrete values
        return None
    if method == "auto" and len(const_np) < auto_min_order:
        return None
    return _separable_qam_plan(const_np, bits_per_symbol)


def _demodulate_soft_separable(symbols, plan, noise_var,
                               reduce=jax.nn.logsumexp):
    """Per-axis LLRs for a separable plan.  ``reduce``: logsumexp gives
    the exact LLR; jnp.max gives the max-log LLR (both factorizations
    are exact — the other axis' term is common to numerator and
    denominator and cancels)."""
    uR, uI, rows = plan
    y = jnp.asarray(symbols)
    noise_var = jnp.asarray(noise_var)
    if noise_var.ndim:
        noise_var = noise_var[..., None]
    dI = -(y.real[..., None] - jnp.asarray(uR)) ** 2 / noise_var
    dQ = -(y.imag[..., None] - jnp.asarray(uI)) ** 2 / noise_var
    neg_inf = jnp.asarray(-jnp.inf, dI.dtype)
    llrs = []
    for axis, mrow in rows:
        d = dI if axis == "I" else dQ
        mk = jnp.asarray(mrow)
        r1 = reduce(jnp.where(mk, d, neg_inf), axis=-1)
        r0 = reduce(jnp.where(mk, neg_inf, d), axis=-1)
        llrs.append(r1 - r0)
    llr = jnp.stack(llrs, axis=-1).astype(jnp.float32)
    lead = llr.shape[:-2]
    return llr.reshape(lead + (-1,))


def demodulate_soft(symbols, constellation, bits_per_symbol: int, noise_var,
                    method: str = "auto"):
    """Exact-LLR soft demapping, log-domain.

    LLR(bit=1 vs 0) per output position, same sign convention as the
    reference (positive -> bit 1), computed with logsumexp instead of the
    reference's exp-sum ratio (modulation.py:125-137).
    Returns float32 ``[..., n_sym * bits_per_symbol]``.

    ``method='auto'`` uses the per-axis factorized form when the
    constellation is a concrete axis-separable product grid (square Gray
    QAM) of order >= 64: sqrt(m)-point 1-D distance rows per axis instead
    of the m-point 2-D matrix — the same exact LLR (the other axis'
    logsumexp cancels; agreement ~2e-5 rel in f32), at ~sqrt(m)/2 the
    work.  v5e-measured: 3.9x at 64-QAM, 11.8x at 256-QAM; at 16-QAM the
    2x work ratio loses to the per-bit stacking overhead, so auto keeps
    the joint path there.  ``method='separable'`` forces the factorized
    form at any order; ``method='joint'`` forces the generic path (any
    labelling, traced constellations).
    """
    plan = _resolve_separable(constellation, bits_per_symbol, method)
    if plan is not None:
        return _demodulate_soft_separable(symbols, plan, noise_var)
    m = len(constellation)
    masks = jnp.asarray(
        constellation_bit_masks(m, bits_per_symbol)
    )  # [bps, m] bool
    noise_var = jnp.asarray(noise_var)
    if noise_var.ndim:  # per-symbol noise variance (e.g. after fading EQ)
        noise_var = noise_var[..., None]
    logw = -_sq_dists(symbols, constellation) / noise_var  # [..., n_sym, m]
    logw = logw[..., None, :]  # [..., n_sym, 1, m]
    neg_inf = jnp.asarray(-jnp.inf, logw.dtype)
    lse1 = jax.nn.logsumexp(jnp.where(masks, logw, neg_inf), axis=-1)
    lse0 = jax.nn.logsumexp(jnp.where(masks, neg_inf, logw), axis=-1)
    llr = lse1 - lse0  # [..., n_sym, bps]
    lead = llr.shape[:-2]
    return llr.reshape(lead + (-1,))


def demodulate_maxlog(symbols, constellation, bits_per_symbol: int, noise_var,
                      method: str = "auto"):
    """Max-log LLR soft demapping (fast path; approximates demodulate_soft).

    Same ``method`` semantics as :func:`demodulate_soft`: separable
    product-grid constellations of order >= 64 take per-axis maxes
    (exact for max-log as well — the other axis' max cancels).
    """
    plan = _resolve_separable(constellation, bits_per_symbol, method)
    if plan is not None:
        return _demodulate_soft_separable(symbols, plan, noise_var,
                                          reduce=jnp.max)
    m = len(constellation)
    masks = jnp.asarray(constellation_bit_masks(m, bits_per_symbol))
    noise_var = jnp.asarray(noise_var)
    if noise_var.ndim:
        noise_var = noise_var[..., None]
    logw = -_sq_dists(symbols, constellation) / noise_var
    logw = logw[..., None, :]
    neg_inf = jnp.asarray(-jnp.inf, logw.dtype)
    max1 = jnp.max(jnp.where(masks, logw, neg_inf), axis=-1)
    max0 = jnp.max(jnp.where(masks, neg_inf, logw), axis=-1)
    llr = max1 - max0
    lead = llr.shape[:-2]
    return llr.reshape(lead + (-1,))
