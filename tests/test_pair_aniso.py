"""Anisotropic (TwoPatchMorse) golden tests incl. torques.

Table replicates /root/reference/src/pytest/test_pair_aniso.py:15-110.
Geometry: particles at [-0.5,-0.10,-0.15] and [0.5,0.10,0.15], identity
orientations (patches along +x).
"""

import collections

import numpy
import pytest

import azplugins_tpu as az

PotentialTestCase = collections.namedtuple(
    "PotentialTestCase",
    ["params", "r_cut", "shift", "energy", "force", "torque"],
)

potential_tests = [
    PotentialTestCase(
        {"M_d": 1.8341, "M_r": 0.0302, "r_eq": 1.0043, "omega": 5.0, "alpha": 0.40,
         "repulsion": False},
        1.6, False,
        -0.20567 * 2,
        (-11.75766, -2.46991, -3.70487),
        (-0.000000, -0.08879, 0.05919),
    ),
    PotentialTestCase(
        {"M_d": 1.8341, "M_r": 0.0302, "r_eq": 1.0043, "omega": 5.0, "alpha": 0.40,
         "repulsion": False},
        1.10, True, -0.14195 * 2, None, None,
    ),
    # outside cutoff
    PotentialTestCase(
        {"M_d": 1.8341, "M_r": 0.0302, "r_eq": 1.0043, "omega": 5.0, "alpha": 0.40,
         "repulsion": False},
        1.0, True, 0, None, None,
    ),
    # M_d = 0
    PotentialTestCase(
        {"M_d": 0.0, "M_r": 0.0302, "r_eq": 1.0043, "omega": 5.0, "alpha": 0.40,
         "repulsion": False},
        1.6, True, 0, None, None,
    ),
    # flat bottom: r < r_eq without repulsion -> U = -M_d, zero force
    PotentialTestCase(
        {"M_d": 1.8341, "M_r": 0.0302, "r_eq": 1.1, "omega": 100.0, "alpha": 0.40,
         "repulsion": False},
        1.6, False, -1.8341, (0, 0, 0), None,
    ),
]


@pytest.mark.parametrize("potential_test", potential_tests)
def test_energy_force_and_torque(simulation_factory, potential_test):
    snap = az.Snapshot(N=2)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[-0.5, -0.10, -0.15], [0.5, 0.10, 0.15]]
    snap.particles.orientation[:] = [[1, 0, 0, 0], [1, 0, 0, 0]]
    sim = simulation_factory(snap)

    integrator = az.md.Integrator(dt=0.001)
    integrator.methods = [az.md.methods.ConstantVolume()]
    potential = az.pair.TwoPatchMorse(
        nlist=az.md.nlist.Cell(buffer=0.4),
        default_r_cut=potential_test.r_cut,
        mode="shift" if potential_test.shift else "none",
    )
    potential.params[("A", "A")] = potential_test.params
    integrator.forces = [potential]
    sim.operations.integrator = integrator
    sim.run(0)

    e = potential_test.energy
    numpy.testing.assert_allclose(
        potential.energies, [0.5 * e, 0.5 * e], rtol=1e-4, atol=1e-4
    )
    if potential_test.force is not None:
        f = numpy.asarray(potential_test.force)
        numpy.testing.assert_allclose(
            potential.forces, [-f, f], rtol=1e-3, atol=2e-4
        )
    if potential_test.torque is not None:
        t = numpy.asarray(potential_test.torque)
        numpy.testing.assert_allclose(
            potential.torques, [t, t], rtol=1e-3, atol=2e-4
        )


def test_torque_direction_consistency(simulation_factory):
    """Torques must rotate patches toward the interparticle axis."""
    import jax.numpy as jnp

    snap = az.Snapshot(N=2)
    snap.configuration.box = [20, 20, 20, 0, 0, 0]
    snap.particles.types = ["A"]
    snap.particles.position[:] = [[-0.5, 0, 0], [0.5, 0, 0]]
    # patch of particle 0 rotated 30 degrees about z: quaternion (cos15, 0,0,sin15)
    th = numpy.deg2rad(30.0) / 2
    snap.particles.orientation[:] = [
        [numpy.cos(th), 0, 0, numpy.sin(th)],
        [1, 0, 0, 0],
    ]
    sim = simulation_factory(snap)
    integrator = az.md.Integrator(dt=0.001)
    integrator.methods = [az.md.methods.ConstantVolume()]
    pot = az.pair.TwoPatchMorse(nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=1.6)
    pot.params[("A", "A")] = dict(
        M_d=1.0, M_r=0.05, r_eq=1.0, omega=5.0, alpha=0.4, repulsion=True
    )
    integrator.forces = [pot]
    sim.operations.integrator = integrator
    sim.run(0)
    torq = pot.torques
    # particle 1 is aligned -> ~no torque; particle 0 misaligned -> torque about z
    assert abs(torq[1][2]) < 1e-4
    assert abs(torq[0][2]) > 1e-4
