import sys as _s; _s.path.insert(0, "/root/repo")
import sys
import numpy as np, jax, jax.numpy as jnp
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.turbo import turbo_encode_device, turbo_decode_device
from commpy_tpu.ops.interleave import RandInterlv
tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
L, B = 512, 64
interlv = RandInterlv(L, 0)
rng = np.random.default_rng(1)
bits = jnp.asarray(rng.integers(0, 2, (B, L)), jnp.int8)
s, p1, p2 = turbo_encode_device(bits, tr, tr, interlv.p_array)
for snr_db in [1.0, 2.0, 3.0]:
    EbN0 = 10**(snr_db/10); rate = 1/3
    ns = float(np.sqrt(1/(2*rate*EbN0)))
    key = jax.random.PRNGKey(7); k1,k2,k3 = jax.random.split(key,3)
    sy = (2.0*s-1) + ns*jax.random.normal(k1, s.shape)
    n1 = (2.0*p1-1) + ns*jax.random.normal(k2, p1.shape)
    n2 = (2.0*p2-1) + ns*jax.random.normal(k3, p2.shape)
    for io in ("f32", "bf16"):
        for win, init in ((None, "warmup"), ((64, 32), "warmup"),
                          ((64, 0), "nii")):
            from commpy_tpu.ops.turbo import _pallas_bcjr_fits
            if not _pallas_bcjr_fits(tr, win, init, L + tr.total_memory, io):
                print(f"SNR {snr_db} dB io={io} window={win} init={init}: "
                      f"skipped (exceeds kernel VMEM budget)")
                continue
            dec = turbo_decode_device(sy, n1, n2, tr, ns**2, 8,
                                      interlv.p_array, window=win,
                                      kernel_io=io, backend="pallas",
                                      window_init=init)
            ber = float(jnp.mean((dec != bits).astype(jnp.float32)))
            print(f"SNR {snr_db} dB io={io} window={win} init={init}: "
                  f"BER = {ber:.3e}")
