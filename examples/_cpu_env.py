"""Shared example preamble: honor an explicit JAX_PLATFORMS=cpu.

Some environments pre-register a remote-accelerator plugin at
interpreter startup that ignores the JAX_PLATFORMS env var, and whose
mere presence routes CPU work through a remote tunnel (measured
25-140x slower; see tests/conftest.py).  Import this module right
after `import jax` in every example.
"""
import os

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass
