"""bench_dbg on the true CPU backend (conftest-style forcing)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    _xb._clear_backends()
except Exception:
    pass

print("backend:", jax.default_backend(), flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_dbg import main

if __name__ == "__main__":
    main()
