"""A/B on device: SCL path-prune permute as batched dot_general+transpose
vs elementwise broadcast-multiply-reduce (no MXU, no transposes).

Also tries stacking all local tensors into one buffer so the per-leaf
prune is a single fused op.  Interleaved same-process medians (the
service drifts between processes); sync via float() value transfer.
"""
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
import commpy_tpu.ops.polar as pol

_F32 = jnp.float32


def make_elem_decoder(code, P=8, bs=5, rule="minsum", pm_rule="approx"):
    """Variant of make_polar_scl_decoder: elementwise permutes + one
    stacked local buffer."""
    N, n = code.N, code.n
    Wb, nb = 1 << bs, N >> bs
    payload_pos = jnp.asarray(code.info_positions[:code.K])
    info_pos = jnp.asarray(code.info_positions)
    crc_h = jnp.asarray(pol.crc_check_table(code.crc, code.k_total), _F32)
    top_llr = pol._make_llr_branches(N, rule, lambda c: c[:, None, :], stop=bs)
    top_ps = pol._make_ps_branches(N, stop=bs)
    j1_np, j2_np = pol._block_schedule(nb, n - bs)
    frz_np = code.frozen_mask.reshape(nb, Wb).astype(np.float32)
    loc_llr = pol._make_llr_branches(Wb, rule, lambda a: a)
    loc_ps = pol._make_ps_branches(Wb)
    lt1_np, lt2_np = pol._leaf_schedule(Wb)

    def perm_rows(state, onehot):  # [W,P,B] x [P,Q,B] -> [W,Q,B]
        return (state[:, :, None, :] * onehot[None]).sum(axis=1)

    def butterfly_rows(bits):
        x = bits
        tail = bits.shape[1:]
        for s in range(bs):
            x = x.reshape((1 << s, 2, Wb >> (s + 1)) + tail)
            x = jnp.concatenate(
                [pol._xor_f(x[:, 0:1], x[:, 1:2]), x[:, 1:2]], axis=1)
            x = x.reshape((Wb,) + tail)
        return x

    ident_np = np.eye(P, dtype=np.float32)[:, :, None]

    @jax.jit
    def decode(llr):
        B = llr.shape[0]
        chan = llr.astype(_F32).T
        L = jnp.zeros((N, P, B), _F32)
        C = jnp.zeros((N, P, B), _F32)
        pm = jnp.concatenate(
            [jnp.zeros((1, B), _F32), jnp.full((P - 1, B), 1e30, _F32)], 0)
        ident = jnp.broadcast_to(jnp.asarray(ident_np), (P, P, B))
        xs = (jnp.asarray(j1_np), jnp.asarray(j2_np), jnp.asarray(frz_np))

        def leaf(state, lt1, frz):
            Ll, Cl, alpha, bits_blk, perm_acc, pm = state
            Ll = lax.switch(lt1, loc_llr, Ll, Cl, alpha)

            def frozen_leaf(Ll, Cl, alpha, bits_blk, perm_acc, pm):
                pen0, _ = pol._pm_penalties(Ll[1], pm_rule)
                return (Ll, Cl, alpha, bits_blk, perm_acc, pm + pen0,
                        jnp.zeros((P, B), _F32))

            def info_leaf(Ll, Cl, alpha, bits_blk, perm_acc, pm):
                pen0, pen1 = pol._pm_penalties(Ll[1], pm_rule)
                cand = jnp.concatenate([pm + pen0, pm + pen1], axis=0)
                neg_top, idx = lax.top_k(-cand.T, P)
                pm_new = (-neg_top).T
                parent = (idx % P).T
                bit = (idx // P).T.astype(_F32)
                onehot = (parent[None] ==
                          jnp.arange(P, dtype=parent.dtype)[:, None, None]
                          ).astype(_F32)
                big = jnp.concatenate([Ll, Cl, alpha, bits_blk, perm_acc],
                                      axis=0)
                big = perm_rows(big, onehot)
                Ll, Cl, alpha, bits_blk, perm_acc = (
                    big[:Wb], big[Wb:2 * Wb], big[2 * Wb:3 * Wb],
                    big[3 * Wb:4 * Wb], big[4 * Wb:])
                return Ll, Cl, alpha, bits_blk, perm_acc, pm_new, bit

            Ll, Cl, alpha, bits_blk, perm_acc, pm, bit = lax.cond(
                frz > 0, frozen_leaf, info_leaf,
                Ll, Cl, alpha, bits_blk, perm_acc, pm)
            return (Ll, Cl, alpha, bits_blk, perm_acc, pm), bit

        def body(carry, x):
            L, C, pm = carry
            j1, j2, frz = x
            L = lax.switch(j1, top_llr, L, C, chan)
            alpha = L[Wb:2 * Wb]
            Ll = jnp.zeros((Wb, P, B), _F32)
            Cl = jnp.zeros((Wb, P, B), _F32)
            bits_blk = jnp.zeros((Wb, P, B), _F32)
            state = (Ll, Cl, alpha, bits_blk, ident, pm)
            for j in range(Wb):
                state, bit = leaf(state, int(lt1_np[j]), frz[j])
                Ll, Cl, alpha, bits_blk, perm_acc, pm = state
                bits_blk = lax.dynamic_update_slice_in_dim(
                    bits_blk, bit[None], j, axis=0)
                Cl = loc_ps[int(lt2_np[j])](Cl, bit[None])
                state = (Ll, Cl, alpha, bits_blk, perm_acc, pm)
            _, _, _, bits_blk, perm_acc, pm = state
            LC = perm_rows(jnp.concatenate([L, C], axis=0), perm_acc)
            L, C = LC[:N], LC[N:]
            beta = butterfly_rows(bits_blk)
            C = lax.switch(j2, top_ps, C, beta)
            return (L, C, pm), (bits_blk, perm_acc)

        (L, C, pm), (bits_all, perms) = lax.scan(body, (L, C, pm), xs)

        def back(cur, y):
            bits_m, perm_m = y
            out = jnp.einsum("wpb,fpb->wfb", bits_m, cur)
            cur2 = jnp.einsum("fpb,opb->fob", cur, perm_m)
            return cur2, out

        _, outs = lax.scan(back, ident, (bits_all, perms), reverse=True)
        u_all = outs.reshape(N, P, B).transpose(2, 1, 0).astype(jnp.int8)
        pm_b = pm.T
        bits_f = u_all[..., info_pos].astype(_F32)
        ok = jnp.all(jnp.mod(bits_f @ crc_h, 2.0) == 0.0, axis=-1)
        score = pm_b + jnp.where(ok, 0.0, 1e20)
        winner = jnp.argmin(score, axis=-1)
        sel = (winner[:, None] == jnp.arange(P)[None, :]).astype(_F32)
        best_u = jnp.einsum("bp,bpn->bn", sel,
                            u_all.astype(_F32)).astype(jnp.int8)
        return best_u[:, payload_pos]

    return decode


def main():
    code = pol.polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
    dec_mm = pol.make_polar_scl_decoder(code, list_size=8, block_exp=5)
    dec_el = make_elem_decoder(code, bs=5)
    B = 256
    x0 = jnp.asarray(
        np.random.RandomState(0).randn(B, 1024).astype(np.float32) * 3)

    a = np.asarray(dec_mm(x0))
    b = np.asarray(dec_el(x0))
    print("elem vs matmul decode equal:", np.array_equal(a, b), flush=True)

    def make_run(dec, r):
        def chained(x):
            def body(c, _):
                d = dec(c)
                return c.at[0, 0].add(
                    jnp.sum(d).astype(c.dtype) * 1e-12), ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        return jax.jit(chained)

    runs = {"matmul": (make_run(dec_mm, 8), make_run(dec_mm, 2)),
            "elem": (make_run(dec_el, 8), make_run(dec_el, 2))}
    for fs in runs.values():
        for f in fs:
            x, s = f(x0)
            _ = float(s)
    res = {k: [] for k in runs}
    for _ in range(5):
        for k, (fhi, flo) in runs.items():
            ts = []
            for f in (fhi, flo):
                t0 = time.perf_counter()
                x, s = f(x0)
                _ = float(s)
                ts.append(time.perf_counter() - t0)
            res[k].append((ts[0] - ts[1]) / 6)
    for k, v in res.items():
        dt = statistics.median(v)
        print(f"{k}: {B*512/dt/1e6:.2f} Mbit/s ({dt*1e3:.2f} ms/decode)")


if __name__ == "__main__":
    main()
