"""Bisect the rebin pipeline TPU-vs-CPU on the saved 64k state.

  python scripts/rebin_bisect.py tpu
  python scripts/rebin_bisect.py cpu   # also diffs
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

    n = dense.N

    @jax.jit
    def stages(state):
        valid = state.tag >= 0
        pos_w, image_w = state.box.wrap(state.position, state.image)
        cid = D._cell_id(
            pos_w[:, 0], pos_w[:, 1], pos_w[:, 2], state.box, spec.dims
        )
        cid = jnp.where(valid, cid, spec.n_cells)
        idx = jnp.arange(n, dtype=jnp.int32)
        idx_bits = max(1, (n - 1).bit_length())
        key = (cid << jnp.int32(idx_bits)) | idx
        key_s = jax.lax.sort(key)
        cid_s = key_s >> jnp.int32(idx_bits)
        perm = key_s & jnp.int32((1 << idx_bits) - 1)
        iota = jnp.arange(n, dtype=jnp.int32)
        change = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
        first = jax.lax.cummax(jnp.where(change, iota, 0))
        rank = iota - first
        valid_s = cid_s < spec.n_cells
        dest = jnp.where(
            valid_s & (rank < spec.cap), cid_s * spec.cap + rank, spec.S
        )
        # representative scatter: tags
        tag_s = jnp.take(state.tag, perm)
        out = jnp.full((spec.S + 1,), -1, jnp.int32).at[dest].set(
            tag_s, mode="drop"
        )[: spec.S]
        return dict(
            pos_w=pos_w, cid=cid, key_s=key_s, perm=perm, rank=rank,
            dest=dest, tag_out=out,
        )

    out = {k: np.asarray(v) for k, v in stages(dense).items()}
    np.savez(f"/tmp/vf64/stages_{MODE}.npz", **out)
    print("saved", flush=True)

    if MODE == "cpu":
        a = np.load("/tmp/vf64/stages_tpu.npz")
        for k in out:
            x, y = a[k], out[k]
            neq = int((x != y).sum())
            print(f"{k}: bitwise-neq={neq}", flush=True)
            if neq and x.dtype.kind in "iu":
                w = np.argwhere((x != y).reshape(x.shape[0], -1).any(axis=-1))[:5]
                for i in w.ravel():
                    print(f"   idx {i}: tpu={x[i]} cpu={y[i]}", flush=True)


if __name__ == "__main__":
    main()
