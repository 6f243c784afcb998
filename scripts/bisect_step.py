"""Find the first corrupt step on TPU, save the pre-state, replay 1 step.

Usage:
  python scripts/bisect_step.py find     # on TPU: save /tmp/vf/pre.npz + post_tpu.npz
  JAX_PLATFORMS=cpu python scripts/bisect_step.py replay  # save post_cpu.npz
  python scripts/bisect_step.py compare  # host-side diff
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def build():
    import azplugins_tpu as az

    n, a = 10, 1.1
    snap = az.Snapshot(N=n**3)
    snap.configuration.box = [n * a] * 3 + [0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(n) + 0.5) * a - n * a / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), -1
    ).reshape(-1, 3)
    sim = az.Simulation(seed=42)
    sim.create_state_from_snapshot(snap)
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5, mode="shift"
    )
    lj.params[("A", "A")] = dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0)
    sim.operations.integrator = az.md.Integrator(
        dt=0.005,
        methods=[az.md.methods.Langevin(kT=1.5, default_gamma=0.5)],
        forces=[lj],
    )
    sim.state.thermalize_particle_momenta(kT=1.5)
    return sim


STATE_KEYS = (
    "position", "tag", "velocity", "typeid", "image", "orientation",
    "mass", "diameter", "charge", "net_force", "acceleration",
)
META_KEYS = ("ref_position", "slot_of", "overflow", "n_builds")


def save(fn, dense, meta, t):
    d = {f"s_{k}": np.asarray(getattr(dense, k)) for k in STATE_KEYS}
    d.update({f"m_{k}": np.asarray(getattr(meta, k)) for k in META_KEYS})
    d["timestep"] = np.int64(t)
    np.savez(fn, **d)


def load(fn, template_dense, template_meta):
    z = np.load(fn)
    dense = template_dense.replace(
        **{k: jnp.asarray(z[f"s_{k}"]) for k in STATE_KEYS}
    )
    meta = template_meta.replace(
        **{k: jnp.asarray(z[f"m_{k}"]) for k in META_KEYS}
    )
    return dense, meta, int(z["timestep"])


def main():
    mode = sys.argv[1]
    if mode == "compare":
        a = np.load("/tmp/vf/post_tpu.npz")
        b = np.load("/tmp/vf/post_cpu.npz")
        for k in sorted(a.files):
            if k == "timestep":
                continue
            x, y = a[k], b[k]
            if x.dtype.kind == "f":
                d = np.abs(x.astype(np.float64) - y.astype(np.float64))
                rel = d.max() / (np.abs(y).max() + 1e-30)
                print(f"{k:16s} maxabs={d.max():.6g} rel={rel:.3g}")
            else:
                neq = int((x != y).sum())
                print(f"{k:16s} int diffs={neq}")
        return

    sim = build()
    if mode == "trace":
        # save the TPU state at every step t=40..70
        sim.run(40)
        save("/tmp/vf/tr_40.npz", sim._dense, sim._meta, sim.timestep)
        for t in range(41, 71):
            sim.run(1)
            save(f"/tmp/vf/tr_{t}.npz", sim._dense, sim._meta, sim.timestep)
        print("trace saved", flush=True)
    elif mode == "replaytrace":
        sim._attach()
        sim._prepare()
        tbls = sim._force_tables()
        for t in range(40, 70):
            dense, meta, tt = load(f"/tmp/vf/tr_{t}.npz", sim._dense, sim._meta)
            nd, nm = sim._run_chunk(dense, meta, jnp.int32(tt), jnp.int32(1), tbls)
            z = np.load(f"/tmp/vf/tr_{t+1}.npz")
            worst = 0.0
            worst_k = ""
            for k in STATE_KEYS:
                x = np.asarray(getattr(nd, k)).astype(np.float64)
                y = z[f"s_{k}"].astype(np.float64)
                d = np.abs(x - y).max()
                if d > worst:
                    worst, worst_k = d, k
            builds_match = int(nm.n_builds) == int(z["m_n_builds"])
            print(
                f"t {t}->{t+1}: worst={worst:.6g} ({worst_k}) "
                f"builds_match={builds_match}",
                flush=True,
            )
    elif mode == "find":
        sim.run(55)
        prev = (sim._dense, sim._meta, sim.timestep)
        for _ in range(40):
            sim.run(1)
            v = np.abs(np.asarray(sim._dense.velocity)).max()
            if v > 10.0:
                print(f"first bad step t={sim.timestep} max|v|={v:.4g}", flush=True)
                save("/tmp/vf/pre.npz", *prev)
                save("/tmp/vf/post_tpu.npz", sim._dense, sim._meta, sim.timestep)
                return
            prev = (sim._dense, sim._meta, sim.timestep)
        print("no bad step found", flush=True)
    elif mode == "replay":
        sim._attach()
        sim._prepare()
        dense, meta, t = load("/tmp/vf/pre.npz", sim._dense, sim._meta)
        tbls = sim._force_tables()
        nd, nm = sim._run_chunk(dense, meta, jnp.int32(t), jnp.int32(1), tbls)
        save("/tmp/vf/post_cpu.npz", nd, nm, t + 1)
        v = np.abs(np.asarray(nd.velocity)).max()
        print(f"replayed t={t}->{t+1} max|v|={v:.4g}", flush=True)


if __name__ == "__main__":
    main()
