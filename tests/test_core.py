"""Unit tests for the core substrate: Box, RNG, Variants, TypeParameter."""

import jax.numpy as jnp
import numpy as np
import pytest

import azplugins_tpu as az
from azplugins_tpu.core import rng
from azplugins_tpu.core.typeparam import TypeParameter


class TestBox:
    def test_wrap_orthorhombic(self):
        box = az.Box.from_lengths(10.0, 12.0, 14.0)
        pos = jnp.asarray([[6.0, -7.0, 20.0]])
        image = jnp.zeros((1, 3), dtype=jnp.int32)
        wrapped, image = box.wrap(pos, image)
        np.testing.assert_allclose(np.asarray(wrapped), [[-4.0, 5.0, 6.0]], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(image), [[1, -1, 1]])

    def test_min_image(self):
        box = az.Box.cube(10.0)
        dr = jnp.asarray([[9.0, 0.2, -9.5]])
        mi = np.asarray(box.min_image(dr))
        np.testing.assert_allclose(mi, [[-1.0, 0.2, 0.5]], atol=1e-5)

    def test_triclinic_roundtrip(self):
        box = az.Box.from_lengths(10.0, 8.0, 6.0, xy=0.3, xz=0.1, yz=-0.2)
        f = jnp.asarray([[0.25, 0.75, 0.5]])
        r = box.make_coordinates(f)
        f2 = box.fraction(r) + 0.5
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f), atol=1e-5)

    def test_volume(self):
        box = az.Box.from_lengths(2.0, 3.0, 4.0, xy=0.5)
        assert float(box.volume()) == pytest.approx(24.0)


class TestRNG:
    def test_deterministic(self):
        a0, a1 = rng.threefry2x32(1, 2, 3, 4)
        b0, b1 = rng.threefry2x32(1, 2, 3, 4)
        assert int(a0) == int(b0) and int(a1) == int(b1)
        c0, _ = rng.threefry2x32(1, 2, 3, 5)
        assert int(a0) != int(c0)

    def test_uniform_range_and_moments(self):
        tags = jnp.arange(200000, dtype=jnp.uint32)
        k0 = jnp.uint32(7)
        x0, _ = rng.threefry2x32(k0, jnp.uint32(0), tags, jnp.uint32(0))
        u = rng.uniform_from_bits(x0, -1.0, 1.0)
        u = np.asarray(u)
        assert u.min() >= -1.0 and u.max() < 1.0
        assert abs(u.mean()) < 0.01
        assert abs(u.var() - 1.0 / 3.0) < 0.01

    def test_pair_symmetry(self):
        a = rng.pair_uniform(200, 11, 5, 3, 17)
        b = rng.pair_uniform(200, 11, 5, 17, 3)
        assert float(a) == float(b)

    def test_known_answer_vs_jax(self):
        # 20-round Threefry-2x32 must agree bitwise with jax.random's own
        # implementation (same cipher, same round schedule).
        from jax._src import prng as jprng

        ref = jprng.threefry_2x32(
            jnp.array([1, 2], dtype=jnp.uint32),
            jnp.array([3, 4], dtype=jnp.uint32),
        )
        mine = rng.threefry2x32(
            jnp.uint32(1), jnp.uint32(2), jnp.uint32(3), jnp.uint32(4)
        )
        assert int(mine[0]) == int(ref[0]) and int(mine[1]) == int(ref[1])

    def test_fast_rounds_distinct_but_uniform(self):
        # Threefry-2x32-13 (the DPD noise cipher) differs from the
        # 20-round stream but keeps uniform statistics.
        tags = jnp.arange(200000, dtype=jnp.uint32)
        x20, _ = rng.threefry2x32(7, 0, tags, 0)
        x13, _ = rng.threefry2x32(7, 0, tags, 0, rounds=rng.FAST_ROUNDS)
        assert int((x20 != x13).sum()) > 199000
        u = np.asarray(rng.uniform_from_bits(x13, -1.0, 1.0))
        assert abs(u.mean()) < 0.01 and abs(u.var() - 1.0 / 3.0) < 0.01

    def test_particle_uniform3_shape(self):
        u = rng.particle_uniform3(210, 1, 0, jnp.arange(10))
        assert u.shape == (10, 3)
        # different timesteps decorrelate
        v = rng.particle_uniform3(210, 1, 1, jnp.arange(10))
        assert not np.allclose(np.asarray(u), np.asarray(v))


class TestVariant:
    def test_constant(self):
        v = az.variant.Constant(2.5)
        assert float(v(0)) == 2.5
        assert float(v(1000)) == 2.5

    def test_ramp(self):
        v = az.variant.Ramp(A=1.0, B=3.0, t_start=10, t_ramp=10)
        assert float(v(0)) == 1.0
        assert float(v(15)) == pytest.approx(2.0)
        assert float(v(1000)) == 3.0

    def test_sphere_area(self):
        # R(t) = sqrt(R0^2 - alpha t / 4pi), clamps at zero
        # (reference /root/reference/src/VariantSphereArea.cc:28-41)
        v = az.variant.SphereArea(R0=2.0, alpha=4.0 * np.pi)
        assert float(v(0)) == pytest.approx(2.0)
        assert float(v(3)) == pytest.approx(1.0)
        assert float(v(100)) == 0.0

    def test_custom_subclass(self):
        class MovingWall(az.variant.Variant):
            def __call__(self, timestep):
                return jnp.where(timestep > 1, 4.0, 5.0)

        v = MovingWall()
        assert float(v(0)) == 5.0
        assert float(v(2)) == 4.0


class TestTypeParameter:
    def test_validation(self):
        tp = TypeParameter("params", 2, {"epsilon": float, "sigma": float, "delta": 0.5})
        tp[("A", "B")] = dict(epsilon=1.0, sigma=2.0)
        assert tp[("B", "A")]["delta"] == 0.5
        with pytest.raises(KeyError):
            tp[("A", "B")] = dict(epsilon=1.0)  # missing sigma
        with pytest.raises(KeyError):
            tp[("A", "B")] = dict(epsilon=1.0, sigma=1.0, bogus=2)

    def test_tables(self):
        tp = TypeParameter("params", 2, {"epsilon": float})
        tp[("A", "A")] = dict(epsilon=1.0)
        tp[("A", "B")] = dict(epsilon=2.0)
        tp[("B", "B")] = dict(epsilon=3.0)
        t = tp.to_dict_tables(["A", "B"])["epsilon"]
        np.testing.assert_allclose(t, [[1.0, 2.0], [2.0, 3.0]])

    def test_scalar_default(self):
        tp = TypeParameter("r_cut", 2, None, float, default=3.0)
        tp[("A", "B")] = 4.0
        t = tp.to_scalar_table(["A", "B"])
        np.testing.assert_allclose(t, [[3.0, 4.0], [4.0, 3.0]])


class TestSnapshot:
    def test_state_roundtrip(self):
        snap = az.Snapshot(N=3, bond_N=1)
        snap.configuration.box = [5, 6, 7, 0, 0, 0]
        snap.particles.types = ["A", "B"]
        snap.particles.position[:] = [[0, 0, 0], [1, 1, 1], [-1, 2, 0.5]]
        snap.particles.typeid[:] = [0, 1, 0]
        snap.particles.mass[:] = [1.0, 2.0, 3.0]
        snap.bonds.types = ["b"]
        snap.bonds.group[0] = [0, 2]

        sim = az.Simulation(seed=1)
        sim.create_state_from_snapshot(snap)
        out = sim.state.get_snapshot()
        np.testing.assert_allclose(out.particles.position, snap.particles.position)
        np.testing.assert_array_equal(out.particles.typeid, snap.particles.typeid)
        np.testing.assert_allclose(out.particles.mass, snap.particles.mass)
        np.testing.assert_array_equal(out.bonds.group, snap.bonds.group)
        assert out.particles.types == ["A", "B"]
