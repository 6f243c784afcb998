"""Compare the compiled Pallas kernel vs the XLA half path on the real TPU."""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import azplugins_tpu as az
from azplugins_tpu.core.state import state_from_snapshot
from azplugins_tpu.ops import dense as D
from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS


def main():
    rng = np.random.default_rng(3)
    N, L = 400, 12.0
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = (rng.random((N, 3)) - 0.5) * L
    state, _, _ = state_from_snapshot(snap)
    spec = D.GridSpec.create(state.box, N, r_cut=1.5, buffer=0.3)
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)

    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        {"epsilon": 1.0, "sigma": 1.0, "attraction_scale_factor": 0.5}
    )
    tables = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    r_cut = jnp.full((1, 1), 1.5, jnp.float32)
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="none", want="force", masked=False,
        )

    os.environ["AZTPU_PALLAS"] = "0"
    ref = np.asarray(run().force)
    os.environ["AZTPU_PALLAS"] = "1"
    got = np.asarray(run().force)
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max()
    print(f"spec dims={spec.dims} cap={spec.cap}")
    print(f"max |F| = {scale:.4f}, max err = {err:.6f}, rel = {err/scale:.2e}")
    bad = np.argwhere(np.abs(got - ref).max(axis=1) > 1e-3 * scale)
    print(f"bad rows: {len(bad)} / {ref.shape[0]}")
    if len(bad):
        i = int(bad[0][0])
        print("first bad slot", i, "ref", ref[i], "got", got[i])


if __name__ == "__main__":
    main()
