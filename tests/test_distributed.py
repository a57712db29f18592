"""Multi-process mesh test (VERDICT r1 item 8): two local processes, four
virtual CPU devices each, ONE global 8-device mesh; a shard_map + psum
tally must agree across processes and with the host-side sum.

This exercises `parallel/distributed.py` for real (jax.distributed over
the local coordinator) — the same recipe scales to multi-host pods where
the collectives ride DCN.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
import jax
from commpy_tpu.parallel import distributed
distributed.initialize(f"localhost:{port}", 2, pid)
assert distributed.is_initialized()
import functools
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from commpy_tpu.parallel.mesh import P, make_mesh, shard_map

pi, pc, ldc, dc = distributed.process_info()
assert pc == 2 and ldc == 4 and dc == 8, (pi, pc, ldc, dc)

mesh = make_mesh()  # global mesh spanning both processes
arr = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
garr = jax.device_put(arr, NamedSharding(mesh, P("dp")))

@functools.partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(),
                   check_vma=False)
def tally(x):
    return jax.lax.psum(jnp.sum(x)[None], "dp")

out = float(np.asarray(jax.jit(tally)(garr))[0])
print(f"RESULT {pid} {out}", flush=True)
"""


@pytest.mark.slow
def test_two_process_global_mesh_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    # The dev box's sitecustomize registers a remote-TPU PJRT backend at
    # interpreter startup (before the worker script body runs), which
    # pre-initializes jax and breaks multi-process CPU init.  Its guard
    # env var must be cleared, and the CPU platform forced, in the
    # *subprocess environment* — the worker script itself is too late.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        lines = [l for l in stdout.splitlines() if l.startswith("RESULT")]
        assert lines, stdout
        outs.append(float(lines[-1].split()[-1]))

    expected = float(np.arange(8 * 16, dtype=np.float32).sum())
    assert outs[0] == outs[1] == expected
