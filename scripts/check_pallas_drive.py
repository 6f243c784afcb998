"""Compare Pallas vs XLA pair force for the exact verify-drive config."""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import azplugins_tpu as az
from azplugins_tpu.core.state import state_from_snapshot
from azplugins_tpu.ops import dense as D
from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS


def compare(state, spec, label, r_cut_val):
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow), label
    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        {"epsilon": 1.0, "sigma": 1.0, "attraction_scale_factor": 1.0}
    )
    tables = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    r_cut = jnp.full((1, 1), r_cut_val, jnp.float32)
    ef = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force

    def run():
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return D.dense_pair_force(
            ef, dense, jb, spec, tables, r_cut,
            mode="shift", want="force", masked=False,
        )

    os.environ["AZTPU_PALLAS"] = "0"
    ref = np.asarray(run().force)
    os.environ["AZTPU_PALLAS"] = "1"
    got = np.asarray(run().force)
    scale = max(np.abs(ref).max(), 1e-9)
    err = np.abs(got - ref).max()
    nbad = int((np.abs(got - ref).max(axis=1) > 1e-3 * scale).sum())
    print(
        f"{label}: dims={spec.dims} cap={spec.cap} C={spec.n_cells} "
        f"max|F|={scale:.4g} err={err:.4g} rel={err/scale:.2e} bad={nbad}",
        flush=True,
    )


def lattice_state(n=10, a=1.1):
    snap = az.Snapshot(N=n**3)
    L = n * a
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(n) + 0.5) * a - L / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), -1
    ).reshape(-1, 3)
    state, _, _ = state_from_snapshot(snap)
    return state


def main():
    state = lattice_state()
    spec = D.GridSpec.create(state.box, state.N, r_cut=2.5, buffer=0.4)
    occ = az.Simulation._max_occupancy_cap(state, spec)
    if occ > spec.cap:
        spec = spec.replace(cap=occ)
    compare(state, spec, "drive lattice", 2.5)

    # melted-ish: jitter the lattice
    rng = np.random.default_rng(0)
    pos = np.asarray(state.position) + rng.normal(0, 0.05, (state.N, 3)).astype(
        np.float32
    )
    state2 = state.replace(position=jnp.asarray(pos, jnp.float32))
    compare(state2, spec, "drive jitter", 2.5)

    # vary cap explicitly
    for cap in (48, 56, 64, 72):
        if cap >= spec.cap:
            compare(state2, spec.replace(cap=cap), f"cap={cap}", 2.5)


if __name__ == "__main__":
    main()
