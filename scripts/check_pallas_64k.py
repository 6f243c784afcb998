"""Pallas vs XLA pair force parity at the 64k bench shapes (dims=12)."""

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
    n_side, rho = 40, 0.85
    N = n_side**3
    L = (N / rho) ** (1 / 3)
    a = L / n_side
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(n_side) + 0.5) * a - L / 2
    pos = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(5)
    pos = pos + rng.normal(0, 0.08, pos.shape)
    state, _, _ = state_from_snapshot(snap)
    state = state.replace(position=jnp.asarray(pos, jnp.float32))

    spec = D.GridSpec.create(state.box, N, r_cut=3.0, buffer=0.4)
    occ = az.Simulation._max_occupancy_cap(state, spec)
    if occ > spec.cap:
        spec = spec.replace(cap=occ)
    cap_env = int(os.environ.get("CHECK_CAP", "0"))
    if cap_env > spec.cap:
        spec = spec.replace(cap=cap_env)
    from azplugins_tpu.ops import pallas_pair as PP

    print(
        f"dims={spec.dims} cap={spec.cap} "
        f"jseg={PP._choose_jseg(14 * spec.cap, spec.cap, 128)}",
        flush=True,
    )
    dense, meta = D.densify(state, spec)
    assert not bool(meta.overflow)

    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=0.5)
    )
    tables = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
    r_cut = jnp.full((1, 1), 3.0, jnp.float32)
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
    bad = int((np.abs(got - ref).max(axis=1) > 1e-3 * scale).sum())
    print(f"max|F|={scale:.4g} err={err:.4g} rel={err/scale:.2e} bad={bad}",
          flush=True)


if __name__ == "__main__":
    main()
