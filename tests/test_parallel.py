"""Multi-device tests on the 8-device CPU mesh.

The reference's distributed contract (SURVEY §2.12): results must not
depend on how the system is decomposed. Here: the same trajectory on 1
device and sharded over 8 devices must agree, and the counter RNG must be
bitwise identical under any sharding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import azplugins_tpu as az

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)

from azplugins_tpu.parallel import make_mesh, shard_state


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def _build(seed=3):
    n, a = 8, 1.2
    N = n**3
    snap = az.Snapshot(N=N)
    L = n * a
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(n) + 0.5) * a - L / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), -1
    ).reshape(-1, 3)
    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    dpd = az.pair.DPDGeneralWeight(
        nlist=az.md.nlist.Cell(buffer=0.4), kT=1.0, default_r_cut=1.0
    )
    dpd.params[("A", "A")] = dict(A=10.0, gamma=4.5, s=2.0)
    sim.operations.integrator = az.md.Integrator(
        dt=0.01, methods=[az.md.methods.ConstantVolume()], forces=[dpd]
    )
    sim._attach()
    sim._prepare()
    return sim


def test_sharded_step_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    sim = _build()
    t0 = jnp.int32(0)
    n = jnp.int32(10)
    tbls = sim._force_tables()

    ref_dense, _, _ = jax.jit(sim._run_chunk_impl)(
        sim._dense, sim._meta, t0, n, jnp.int32(5), tbls
    )

    S = sim._dense.position.shape[0]
    ndev = 8 if S % 8 == 0 else (4 if S % 4 == 0 else 2)
    assert S % ndev == 0, f"slot count {S} awkward for mesh"
    mesh = make_mesh(ndev)
    dense_sh = shard_state(sim._dense, mesh)
    meta_sh = sim._meta.replace(
        ref_position=jax.device_put(
            sim._meta.ref_position, NamedSharding(mesh, P("d"))
        ),
        slot_of=jax.device_put(sim._meta.slot_of, NamedSharding(mesh, P())),
    )
    out_dense, _, _ = jax.jit(sim._run_chunk_impl)(
        dense_sh, meta_sh, t0, n, jnp.int32(5), tbls
    )

    np.testing.assert_allclose(
        np.asarray(ref_dense.position), np.asarray(out_dense.position), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_dense.velocity), np.asarray(out_dense.velocity), atol=2e-5
    )


def test_rng_bitwise_identical_under_sharding():
    from azplugins_tpu.core import rng

    tags = jnp.arange(4096, dtype=jnp.uint32)
    ref = np.asarray(rng.particle_uniform3(202, 5, 17, tags))
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    tags_sh = jax.device_put(tags, NamedSharding(mesh, P("d")))
    out = np.asarray(jax.jit(lambda t: rng.particle_uniform3(202, 5, 17, t))(tags_sh))
    np.testing.assert_array_equal(ref, out)


def test_graft_entry_and_dryrun():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out_state, out_meta, violated = jax.jit(fn)(*args)
    assert out_state.position.shape == args[0].position.shape
    assert not bool(violated)

    mod.dryrun_multichip(8)
