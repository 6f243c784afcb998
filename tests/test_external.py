"""External potential tests: harmonic barriers (moving variant, mid-run
param change) and LJ93/colloid walls.

Barrier geometry cases replicate /root/reference/src/pytest/test_external.py.
"""

import jax.numpy as jnp
import numpy
import pytest

import azplugins_tpu as az


class CustomVariant(az.variant.Variant):
    """Barrier at z for t<=1, z-1 after (reference test_external.py:11-28)."""

    def __init__(self, z):
        self.z = float(z)

    def __call__(self, timestep):
        return jnp.where(timestep <= 1, self.z, self.z - 1.0)

    def range(self):
        return (self.z - 1, self.z)


def _integrator():
    return az.md.Integrator(dt=0.0, methods=[az.md.methods.ConstantVolume()])


@pytest.mark.parametrize(
    "cls", [az.external.PlanarHarmonicBarrier, az.external.SphericalHarmonicBarrier]
)
def test_create_and_params_survive(simulation_factory, two_particle_snapshot_factory, cls):
    barrier = cls(location=3.0)
    barrier.params["A"].update(dict(k=10.0, offset=0.5))
    sim = simulation_factory(two_particle_snapshot_factory())
    integrator = _integrator()
    sim.operations.integrator = integrator
    integrator.forces.append(barrier)
    assert isinstance(barrier.location, az.variant.Constant)
    assert float(barrier.location(0)) == 3.0
    assert barrier.params["A"] == dict(k=10.0, offset=0.5)
    with pytest.warns(UserWarning):
        sim.run(0)
    assert float(barrier.location(0)) == 3.0
    assert barrier.params["A"] == dict(k=10.0, offset=0.5)


def test_spherical_harmonic_barrier(simulation_factory):
    snap = az.Snapshot(N=4)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A", "B"]
    snap.particles.position[:] = [[0, 0, 4.6], [0, 0, -5.4], [0, 5.6, 0], [6.6, 0, 0]]
    snap.particles.typeid[:] = [0, 1, 0, 0]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    barrier = az.external.SphericalHarmonicBarrier(location=CustomVariant(z=5.0))
    kA = 50.0
    kB = kA * 2.0**2
    barrier.params["A"] = dict(k=kA, offset=0.1)
    barrier.params["B"] = dict(k=kB, offset=-0.1)
    sim.operations.integrator.forces.append(barrier)

    sim.run(1)  # barrier still at 5.0
    forces, energies = barrier.forces, barrier.energies
    assert numpy.isclose(energies[0], 0.0)
    numpy.testing.assert_allclose(forces[0], [0, 0, 0], atol=1e-4)
    assert numpy.isclose(energies[1], 0.5 * kB * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[1], [0.0, 0.0, kB * 0.5], atol=1e-3)
    assert numpy.isclose(energies[2], 0.5 * kA * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[2], [0.0, -kA * 0.5, 0.0], atol=1e-3)
    assert numpy.isclose(energies[3], 0.5 * kA * 1.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[3], [-kA * 1.5, 0.0, 0.0], atol=1e-3)

    # disable B mid-run; barrier moves to 4.0
    barrier.params["B"] = dict(k=0.0, offset=-0.1)
    sim.run(2)
    forces, energies = barrier.forces, barrier.energies
    assert numpy.isclose(energies[0], 0.5 * kA * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[0], [0.0, 0.0, -kA * 0.5], atol=1e-3)
    assert numpy.isclose(energies[1], 0.0, atol=1e-4)
    numpy.testing.assert_allclose(forces[1], [0, 0, 0], atol=1e-4)
    assert numpy.isclose(energies[2], 0.5 * kA * 1.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[2], [0.0, -kA * 1.5, 0.0], atol=1e-3)
    assert numpy.isclose(energies[3], 0.5 * kA * 2.5**2, atol=1e-2)
    numpy.testing.assert_allclose(forces[3], [-kA * 2.5, 0.0, 0.0], atol=1e-3)


def test_planar_harmonic_barrier(simulation_factory):
    snap = az.Snapshot(N=4)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A", "B"]
    snap.particles.position[:] = [[1, 4.6, 1], [-1, 5.4, 1], [1, 5.6, -1], [-1, 6.6, -1]]
    snap.particles.typeid[:] = [0, 1, 0, 0]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    barrier = az.external.PlanarHarmonicBarrier(location=CustomVariant(z=5.0))
    kA = 50.0
    kB = kA * 2.0**2
    barrier.params["A"] = dict(k=kA, offset=0.1)
    barrier.params["B"] = dict(k=kB, offset=-0.1)
    sim.operations.integrator.forces.append(barrier)

    sim.run(1)
    forces, energies = barrier.forces, barrier.energies
    assert numpy.isclose(energies[0], 0.0)
    numpy.testing.assert_allclose(forces[0], [0, 0, 0], atol=1e-4)
    assert numpy.isclose(energies[1], 0.5 * kB * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[1], [0.0, -kB * 0.5, 0.0], atol=1e-3)
    assert numpy.isclose(energies[2], 0.5 * kA * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[2], [0.0, -kA * 0.5, 0.0], atol=1e-3)
    assert numpy.isclose(energies[3], 0.5 * kA * 1.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[3], [0.0, -kA * 1.5, 0.0], atol=1e-3)

    barrier.params["B"] = dict(k=0.0, offset=-0.1)
    sim.run(2)
    forces, energies = barrier.forces, barrier.energies
    assert numpy.isclose(energies[0], 0.5 * kA * 0.5**2, atol=1e-3)
    numpy.testing.assert_allclose(forces[0], [0.0, -kA * 0.5, 0.0], atol=1e-3)
    assert numpy.isclose(energies[1], 0.0, atol=1e-4)
    assert numpy.isclose(energies[2], 0.5 * kA * 1.5**2, atol=1e-3)
    assert numpy.isclose(energies[3], 0.5 * kA * 2.5**2, atol=1e-2)
    numpy.testing.assert_allclose(forces[3], [0.0, -kA * 2.5, 0.0], atol=1e-3)


def test_lj93_wall(simulation_factory):
    """LJ93 wall: analytic energy/force at distance z from the plane."""
    snap = az.Snapshot(N=2)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[0, 0, -9.0 + 1.2], [3.0, 2.0, -9.0 + 5.0]]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    plane = az.external.wall.Plane(origin=(0, 0, -9.0), normal=(0, 0, 1))
    w = az.external.wall.LJ93(walls=[plane])
    eps, sig = 2.0, 1.1
    w.params["A"] = dict(epsilon=eps, sigma=sig, r_cut=3.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    z = 1.2
    lj1 = (2.0 / 15.0) * eps * sig**9
    lj2 = eps * sig**3
    U = lj1 / z**9 - lj2 / z**3
    F = (9 * lj1 / z**10 - 3 * lj2 / z**4)  # magnitude along +z
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-5)
    numpy.testing.assert_allclose(w.forces[0], [0, 0, F], rtol=1e-5, atol=1e-6)
    # particle beyond r_cut feels nothing
    numpy.testing.assert_allclose(w.energies[1], 0.0, atol=1e-6)
    numpy.testing.assert_allclose(w.forces[1], [0, 0, 0], atol=1e-6)


def test_colloid_wall(simulation_factory):
    """Colloid wall: analytic value for a sphere of diameter d at distance z."""
    snap = az.Snapshot(N=1)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[0, 0, -9.0 + 2.5]]
    snap.particles.diameter[:] = [3.0]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    plane = az.external.wall.Plane(origin=(0, 0, -9.0), normal=(0, 0, 1))
    w = az.external.wall.Colloid(walls=[plane])
    A, sig = 100.0, 1.05
    w.params["A"] = dict(A=A, sigma=sig, r_cut=6.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    # closed-form reference (WallEvaluatorColloid.h:114-151)
    a, z = 1.5, 2.5
    C1 = A * sig**6 / 7560.0
    C2 = A / 6.0
    U = C1 * ((7 * a - z) / (z - a) ** 7 + (7 * a + z) / (z + a) ** 7)
    U -= C2 * (2 * a * z / (z**2 - a**2) + numpy.log((z - a) / (z + a)))
    f_divr = 6 * C1 * (
        (8 * (a / z) - 1) / (z - a) ** 8 + (8 * (a / z) + 1) / (z + a) ** 8
    ) - C2 * 4 * a**2 * (a / z) / (z**2 - a**2) ** 2
    F = f_divr * z
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-4)
    numpy.testing.assert_allclose(w.forces[0], [0, 0, F], rtol=1e-4, atol=1e-6)


def test_barrier_outside_box_raises(simulation_factory, two_particle_snapshot_factory):
    sim = simulation_factory(two_particle_snapshot_factory(L=10.0))
    barrier = az.external.PlanarHarmonicBarrier(location=50.0)
    barrier.params["A"] = dict(k=1.0, offset=0.0)
    sim.operations.integrator = _integrator()
    sim.operations.integrator.forces.append(barrier)
    with pytest.raises(ValueError):
        sim.run(0)


def _lj93_closed_form(eps, sig, z):
    lj1 = (2.0 / 15.0) * eps * sig**9
    lj2 = eps * sig**3
    U = lj1 / z**9 - lj2 / z**3
    F = 9 * lj1 / z**10 - 3 * lj2 / z**4
    return U, F


def test_lj93_sphere_wall(simulation_factory):
    """Sphere wall (inside): gap distance d = R - |r|, force radially inward."""
    snap = az.Snapshot(N=2)
    snap.configuration.box = [30, 30, 30, 0, 0, 0]
    snap.particles.types = ["A"]
    # particle 0 at radius 4 inside an R=5.5 sphere -> d = 1.5
    snap.particles.position[:] = [[4.0, 0, 0], [0, 0, 0]]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    sphere = az.external.wall.Sphere(radius=5.5, inside=True)
    w = az.external.wall.LJ93(walls=[sphere])
    eps, sig = 2.0, 1.1
    w.params["A"] = dict(epsilon=eps, sigma=sig, r_cut=3.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    U, F = _lj93_closed_form(eps, sig, 1.5)
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-5)
    # direction of increasing gap = toward the center = -x
    numpy.testing.assert_allclose(w.forces[0], [-F, 0, 0], rtol=1e-5, atol=1e-6)
    # center particle: d = 5.5 > r_cut -> nothing
    numpy.testing.assert_allclose(w.energies[1], 0.0, atol=1e-6)


def test_lj93_sphere_wall_outside(simulation_factory):
    """Sphere wall (outside): d = |r| - R, force radially outward."""
    snap = az.Snapshot(N=1)
    snap.configuration.box = [30, 30, 30, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[0, 4.0, 0]]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    sphere = az.external.wall.Sphere(radius=2.5, inside=False)
    w = az.external.wall.LJ93(walls=[sphere])
    eps, sig = 1.5, 1.0
    w.params["A"] = dict(epsilon=eps, sigma=sig, r_cut=3.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    U, F = _lj93_closed_form(eps, sig, 1.5)
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-5)
    numpy.testing.assert_allclose(w.forces[0], [0, F, 0], rtol=1e-5, atol=1e-6)


def test_lj93_cylinder_wall(simulation_factory):
    """Cylinder wall (inside, z axis): d = R - rho, force toward the axis."""
    snap = az.Snapshot(N=1)
    snap.configuration.box = [30, 30, 30, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[3.0, 0, 5.0]]  # rho = 3, z free
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    cyl = az.external.wall.Cylinder(radius=4.2, axis=(0, 0, 1), inside=True)
    w = az.external.wall.LJ93(walls=[cyl])
    eps, sig = 2.0, 1.1
    w.params["A"] = dict(epsilon=eps, sigma=sig, r_cut=3.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    U, F = _lj93_closed_form(eps, sig, 1.2)
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-5)
    numpy.testing.assert_allclose(w.forces[0], [-F, 0, 0], rtol=1e-5, atol=1e-6)


def test_lj93_wall_r_extrap(simulation_factory):
    """r_extrap: linear continuation below r_extrap, finite when penetrated.

    Semantics of HOOMD's EvaluatorWalls extrapolated mode, consumed by the
    reference at /root/reference/src/WallPotentials.h:63-85.
    """
    snap = az.Snapshot(N=3)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A"]
    # wall plane at z=-9: distances 0.5 (below r_extrap), -0.3 (penetrated),
    # 2.0 (normal branch)
    snap.particles.position[:] = [
        [0, 0, -8.5],
        [0, 0, -9.3],
        [0, 0, -7.0],
    ]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    plane = az.external.wall.Plane(origin=(0, 0, -9.0), normal=(0, 0, 1))
    w = az.external.wall.LJ93(walls=[plane])
    eps, sig, rext = 2.0, 1.1, 1.0
    w.params["A"] = dict(epsilon=eps, sigma=sig, r_cut=3.0, r_extrap=rext)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    U_ext, F_ext = _lj93_closed_form(eps, sig, rext)
    # d = 0.5 < r_extrap: F = F(rext), U = U(rext) + (rext - d) F(rext)
    numpy.testing.assert_allclose(w.forces[0], [0, 0, F_ext], rtol=1e-5)
    numpy.testing.assert_allclose(
        w.energies[0], U_ext + (rext - 0.5) * F_ext, rtol=1e-5
    )
    # penetrated d = -0.3: same force, energy keeps growing linearly
    numpy.testing.assert_allclose(w.forces[1], [0, 0, F_ext], rtol=1e-5)
    numpy.testing.assert_allclose(
        w.energies[1], U_ext + (rext + 0.3) * F_ext, rtol=1e-5
    )
    # d = 2.0 >= r_extrap: normal branch untouched
    U2, F2 = _lj93_closed_form(eps, sig, 2.0)
    numpy.testing.assert_allclose(w.forces[2], [0, 0, F2], rtol=1e-5, atol=1e-6)
    numpy.testing.assert_allclose(w.energies[2], U2, rtol=1e-5)


def test_colloid_sphere_wall(simulation_factory):
    """Colloid evaluator on a spherical wall geometry (diameter-aware)."""
    snap = az.Snapshot(N=1)
    snap.configuration.box = [40, 40, 40, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[0, 0, 6.0]]  # R=8.5 inside -> d = 2.5
    snap.particles.diameter[:] = [3.0]
    sim = simulation_factory(snap)
    sim.operations.integrator = _integrator()

    sphere = az.external.wall.Sphere(radius=8.5, inside=True)
    w = az.external.wall.Colloid(walls=[sphere])
    A, sig = 100.0, 1.05
    w.params["A"] = dict(A=A, sigma=sig, r_cut=6.0)
    sim.operations.integrator.forces.append(w)
    sim.run(0)

    a, z = 1.5, 2.5
    C1 = A * sig**6 / 7560.0
    C2 = A / 6.0
    U = C1 * ((7 * a - z) / (z - a) ** 7 + (7 * a + z) / (z + a) ** 7)
    U -= C2 * (2 * a * z / (z**2 - a**2) + numpy.log((z - a) / (z + a)))
    f_divr = 6 * C1 * (
        (8 * (a / z) - 1) / (z - a) ** 8 + (8 * (a / z) + 1) / (z + a) ** 8
    ) - C2 * 4 * a**2 * (a / z) / (z**2 - a**2) ** 2
    F = f_divr * z
    numpy.testing.assert_allclose(w.energies[0], U, rtol=1e-4)
    numpy.testing.assert_allclose(w.forces[0], [0, 0, -F], rtol=1e-4, atol=1e-6)
