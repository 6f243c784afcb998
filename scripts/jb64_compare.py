"""Compare make_jblocks output TPU vs CPU bitwise on a saved 64k state.

  python scripts/jb64_compare.py tpu   # writes /tmp/vf64/jb_tpu.npz
  python scripts/jb64_compare.py cpu   # writes /tmp/vf64/jb_cpu.npz + diff
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = sys.argv[1]
if MODE == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

if MODE == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        _xb._clear_backends()
    except Exception:
        pass

import jax.numpy as jnp

from bisect_step import load
from azplugins_tpu.ops import dense as D


def main():
    from bench import build_sim

    sim, lj = build_sim()
    sim._attach()
    sim._ensure_dense()
    spec = sim._grid_spec
    dense, meta, t = load("/tmp/vf64/tr_120.npz", sim._dense, sim._meta)

    jb_fn = jax.jit(
        lambda d: D.make_jblocks(d, spec, half=True, need_typeid=False)
    )
    jb = jb_fn(dense)
    out = dict(x=np.asarray(jb.x), y=np.asarray(jb.y), z=np.asarray(jb.z))
    np.savez(f"/tmp/vf64/jb_{MODE}.npz", **out)
    print(f"saved jb_{MODE}; shapes {out['x'].shape}", flush=True)

    # also a rebin comparison: same input -> deterministic output
    reb = jax.jit(
        lambda d, m: D.rebin(d, m, spec, sim._state.N, sim._fields)
    )
    nd, nm = reb(dense, meta)
    np.savez(
        f"/tmp/vf64/reb_{MODE}.npz",
        position=np.asarray(nd.position),
        tag=np.asarray(nd.tag),
        velocity=np.asarray(nd.velocity),
        overflow=np.asarray(nm.overflow),
    )
    print(f"saved reb_{MODE}", flush=True)

    if MODE == "cpu":
        for name in ("jb", "reb"):
            a = np.load(f"/tmp/vf64/{name}_tpu.npz")
            b = np.load(f"/tmp/vf64/{name}_cpu.npz")
            for k in a.files:
                x, y = a[k], b[k]
                if x.dtype.kind == "f":
                    neq = int((x != y).sum())
                    d = np.abs(x.astype(np.float64) - y.astype(np.float64))
                    print(f"{name}.{k}: bitwise-neq={neq} maxdiff={d.max():.6g}",
                          flush=True)
                else:
                    print(f"{name}.{k}: neq={int((x != y).sum())}", flush=True)


if __name__ == "__main__":
    main()
