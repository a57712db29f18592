"""Sharded Monte-Carlo BER engine.

This replaces the reference's central hot loop — the serial per-chunk
``while bit_send < send_max and bit_err < err_min`` (links.py:313-338) —
with rounds of a single jitted program:

    [n_snr] x [frames] frames are simulated per round; the frame axis is
    sharded over the device mesh with shard_map, error counts are reduced
    with psum over ICI, and the host only handles the (rare) stopping
    decision between rounds.

The user supplies one pure function ``link_step(keys, noise_std) ->
bit_errors`` that simulates a *batch* of frames end-to-end (encode ->
modulate -> channel -> receive -> decode -> xor-count).  Everything inside
is traced once and compiled; per-(snr, round, device, frame) randomness
comes from counter-based key folding.
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh, P, shard_map

__all__ = ["MonteCarloResult", "montecarlo_ber", "make_round_fn"]

logger = logging.getLogger("commpy_tpu.montecarlo")


@dataclass
class MonteCarloResult:
    snrs_db: np.ndarray
    bers: np.ndarray
    bit_errors: np.ndarray
    bits_sent: np.ndarray
    rounds: int


def make_round_fn(
    link_step: Callable,
    noise_stds: Sequence[float],
    frames_per_round: int,
    mesh: Optional[Mesh] = None,
    axis_name: str = "dp",
):
    """Build the jitted one-round function ``key -> bit_errors [n_snr]``.

    ``link_step(keys [F_local], noise_std) -> total bit errors (scalar)``.
    With a mesh, the frame axis is sharded across devices and the error
    count is psum-reduced; without, it runs single-device.
    """
    noise_stds = jnp.asarray(noise_stds, jnp.float32)
    n_snr = noise_stds.shape[0]

    if mesh is None:
        def round_fn(key):
            def per_snr(k, ns):
                keys = jax.random.split(k, frames_per_round)
                return link_step(keys, ns)
            return jax.vmap(per_snr)(jax.random.split(key, n_snr), noise_stds)
        fn = jax.jit(round_fn)
        fn._mc_frames_per_round = frames_per_round
        fn._mc_noise_stds = np.asarray(noise_stds)
        return fn

    n_dev = mesh.devices.size
    if frames_per_round % n_dev:
        raise ValueError(
            f"frames_per_round ({frames_per_round}) must be a multiple of "
            f"the mesh size ({n_dev})"
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(),
        # Decoder scans build fresh carries (jnp.full) that are unvarying
        # w.r.t. the mesh axis; skip the strict varying-axes check.
        check_vma=False,
    )
    def sharded_step(keys, noise_stds_rep):
        # keys: [n_snr, F_local, 2]; one shard of the frame axis.
        def per_snr(k, ns):
            return link_step(k, ns)
        local = jax.vmap(per_snr)(keys, noise_stds_rep)  # [n_snr]
        return jax.lax.psum(local, axis_name)

    def round_fn(key):
        keys = jax.vmap(
            lambda k: jax.random.split(k, frames_per_round)
        )(jax.random.split(key, n_snr))  # [n_snr, F, 2]
        return sharded_step(keys, noise_stds)

    fn = jax.jit(round_fn)
    fn._mc_frames_per_round = frames_per_round
    fn._mc_noise_stds = np.asarray(noise_stds)
    return fn


def montecarlo_ber(
    link_step: Callable,
    snrs_db,
    noise_std_fn: Callable,
    frame_bits: int,
    key,
    *,
    frames_per_round: int,
    max_rounds: int = 100,
    err_min: int = 100,
    send_max: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "dp",
    checkpoint_path: Optional[str] = None,
    round_fn: Optional[Callable] = None,
) -> MonteCarloResult:
    """Run the sharded BER sweep with err_min / send_max early stopping.

    Semantics mirror the reference driver (links.py:309-341) at round
    granularity: an SNR point stops accumulating once it has err_min bit
    errors or send_max sent bits; finished points are frozen.

    Parameters
    ----------
    link_step : ``(keys [F], noise_std) -> bit errors`` pure fn
    noise_std_fn : ``snr_db -> noise_std`` (see ops.channel.snr_to_noise_std)
    frame_bits : message bits per frame (for BER normalization)
    checkpoint_path : optional JSON file; tallies + round counter are
        persisted after every round and the sweep resumes from it if it
        exists (counter-based PRNG makes resumed rounds reproducible —
        the checkpoint/resume subsystem the reference lacks, SURVEY §5).
    round_fn : optional prebuilt :func:`make_round_fn` result.  Pass it
        when calling the sweep repeatedly with the same configuration so
        the jitted round program (and its compile cache) is reused
        across calls instead of being rebuilt each time.
    """
    snrs_db = np.atleast_1d(np.asarray(snrs_db, float))
    noise_stds = np.asarray([float(noise_std_fn(s)) for s in snrs_db])
    if round_fn is None:
        round_fn = make_round_fn(
            link_step, noise_stds, frames_per_round, mesh, axis_name
        )
    else:
        # a prebuilt round function must agree with THIS sweep's
        # configuration, or the per-round bit accounting silently
        # corrupts every reported BER
        fpr = getattr(round_fn, "_mc_frames_per_round", None)
        if fpr is not None and fpr != frames_per_round:
            raise ValueError(
                f"round_fn was built with frames_per_round={fpr}, sweep "
                f"requested {frames_per_round}"
            )
        ns = getattr(round_fn, "_mc_noise_stds", None)
        if ns is not None and not np.allclose(ns, noise_stds):
            raise ValueError(
                "round_fn was built with different noise_stds than this "
                "sweep's snrs_db/noise_std_fn produce"
            )

    n_snr = len(snrs_db)
    bits_per_round = frames_per_round * frame_bits
    if send_max is None:
        send_max = bits_per_round * max_rounds

    tot_err = np.zeros(n_snr)
    tot_bits = np.zeros(n_snr)
    active = np.ones(n_snr, bool)
    start_round = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            st = json.load(f)
        if st["snrs_db"] == list(map(float, snrs_db)):
            tot_err = np.asarray(st["bit_errors"], float)
            tot_bits = np.asarray(st["bits_sent"], float)
            # activity is recomputed against THIS run's limits (the
            # stored flags reflect the previous run's send_max)
            active = (tot_err < err_min) & (tot_bits < send_max)
            start_round = int(st["round"])
            logger.info("resumed sweep from %s at round %d",
                        checkpoint_path, start_round)

    rounds = start_round
    for r in range(start_round, max_rounds):
        if not active.any():
            break
        t0 = time.perf_counter()
        errs = np.asarray(round_fn(jax.random.fold_in(key, r)))
        dt = time.perf_counter() - t0
        tot_err[active] += errs[active]
        tot_bits[active] += bits_per_round
        rounds = r + 1
        active &= (tot_err < err_min) & (tot_bits < send_max)
        logger.info(
            "round %d: %d/%d SNR points active, %.3g bits/s",
            rounds, int(active.sum()), n_snr,
            n_snr * bits_per_round / dt,
        )
        if checkpoint_path:
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "snrs_db": list(map(float, snrs_db)),
                        "bit_errors": tot_err.tolist(),
                        "bits_sent": tot_bits.tolist(),
                        "active": active.tolist(),
                        "round": rounds,
                    },
                    f,
                )
            os.replace(tmp, checkpoint_path)

    with np.errstate(invalid="ignore"):
        bers = np.where(tot_bits > 0, tot_err / np.maximum(tot_bits, 1), 0.0)
    return MonteCarloResult(snrs_db, bers, tot_err, tot_bits, rounds)
