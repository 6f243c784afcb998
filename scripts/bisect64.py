"""64k TPU-vs-CPU step bisection.

  python scripts/bisect64.py trace    # TPU: run to t=90, save every step to t=130
  python scripts/bisect64.py replay   # true CPU: replay each saved step, diff
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = sys.argv[1] if len(sys.argv) > 1 else "trace"

if MODE == "replay":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

if MODE == "replay":
    try:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        _xb._clear_backends()
    except Exception:
        pass

import jax.numpy as jnp

from bisect_step import STATE_KEYS, META_KEYS, save, load  # noqa: E402

T_START, T_END = 90, 130
DIR = "/tmp/vf64"


def build():
    from bench import build_sim

    sim, lj = build_sim()
    sim.max_chunk = 1000
    return sim


def main():
    os.makedirs(DIR, exist_ok=True)
    sim = build()
    if MODE == "trace":
        sim.run(T_START)
        save(f"{DIR}/tr_{T_START}.npz", sim._dense, sim._meta, sim.timestep)
        for t in range(T_START + 1, T_END + 1):
            sim.run(1)
            save(f"{DIR}/tr_{t}.npz", sim._dense, sim._meta, sim.timestep)
            v = np.abs(np.asarray(sim._dense.velocity)).max()
            print(f"t={t} max|v|={v:.4g} builds={int(sim._meta.n_builds)} "
                  f"seg={sim._seg_len}", flush=True)
    else:
        sim._attach()
        sim._prepare()
        tbls = sim._force_tables()
        for t in range(T_START, T_END):
            try:
                dense, meta, tt = load(f"{DIR}/tr_{t}.npz", sim._dense, sim._meta)
                z = np.load(f"{DIR}/tr_{t+1}.npz")
            except FileNotFoundError:
                break
            # committed rebuild interval per step, read off the TPU trace
            # (violation halvings at steps 108 and 127)
            seg = 10 if tt < 108 else (2 if tt < 127 else 1)
            nd, nm, viol = sim._run_chunk(
                dense, meta, jnp.int32(tt), jnp.int32(1),
                jnp.int32(seg), tbls, tt % seg == 0
            )
            worst = {}
            for k in ("position", "velocity"):
                x = np.asarray(getattr(nd, k)).astype(np.float64)
                y = z[f"s_{k}"].astype(np.float64)
                worst[k] = np.abs(x - y).max()
            vmax = np.abs(np.asarray(nd.velocity)).max()
            print(
                f"t {t}->{t+1}: dpos={worst['position']:.4g} "
                f"dvel={worst['velocity']:.4g} max|v|={vmax:.4g} "
                f"builds cpu={int(nm.n_builds)} tpu={int(z['m_n_builds'])}",
                flush=True,
            )


if __name__ == "__main__":
    main()
