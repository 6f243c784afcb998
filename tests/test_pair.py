"""Pair potential golden parity tests.

The table replicates the reference's analytic test cases
(/root/reference/src/pytest/test_pair.py:15-306) — those values are
framework-independent physics truths: two particles at distance d, the
total energy splits [U/2, U/2] and forces are [[-f,0,0],[f,0,0]].
"""

import collections

import numpy
import pytest

import azplugins_tpu as az

PotentialTestCase = collections.namedtuple(
    "PotentialTestCase",
    ["potential", "params", "r_cut", "shift", "distance", "energy", "force"],
)

potential_tests = [
    # Colloid: solvent-solvent branch
    PotentialTestCase(
        az.pair.Colloid,
        {"A": 100.0, "a_1": 0, "a_2": 0, "sigma": 2.0},
        6.0, False, 3.0, -0.2224, -0.4020,
    ),
    # colloid-solvent branch (both radius orders)
    PotentialTestCase(
        az.pair.Colloid,
        {"A": 100.0, "a_1": 1.5, "a_2": 0, "sigma": 1.05},
        6.0, False, 3.0, -0.2757, -0.7107,
    ),
    PotentialTestCase(
        az.pair.Colloid,
        {"A": 100.0, "a_1": 0, "a_2": 1.5, "sigma": 1.05},
        6.0, False, 3.0, -0.2757, -0.7107,
    ),
    # colloid-colloid branch
    PotentialTestCase(
        az.pair.Colloid,
        {"A": 100.0, "a_1": 1.5, "a_2": 0.75, "sigma": 1.05},
        6.0, False, 3.0, -1.0366, -1.8267,
    ),
    # outside r_cut
    PotentialTestCase(
        az.pair.Colloid,
        {"A": 100.0, "a_1": 1.5, "a_2": 0.75, "sigma": 1.05},
        6.0, False, 7.0, 0, 0,
    ),
    # DPD conservative force (kT = 0 zeroes the random force)
    PotentialTestCase(
        az.pair.DPDGeneralWeight,
        {"A": 2.0, "gamma": 4.5, "s": 0.5},
        1.0, False, 0.5, 0.25, 1.0,
    ),
    PotentialTestCase(
        az.pair.DPDGeneralWeight,
        {"A": 25.0, "gamma": 4.5, "s": 2},
        1.0, False, 1.05, 0, 0,
    ),
    PotentialTestCase(
        az.pair.DPDGeneralWeight,
        {"A": 0.0, "gamma": 4.5, "s": 2},
        1.0, False, 0.5, 0, 0,
    ),
    # ExpandedYukawa
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 1.0, "kappa": 1.0, "delta": 1.0},
        3.0, False, 1.05, 19.024588490014263, 399.5163582902992,
    ),
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 3.0, "kappa": 1.0, "delta": 1.0},
        3.0, False, 1.05, 57.07376547004279, 1198.5490748708976,
    ),
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 1.0, "kappa": 1.0, "delta": 3.0},
        9.0, False, 3.05, 19.024588490014263, 399.5163582902992,
    ),
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 1.0, "kappa": 3.0, "delta": 1.0},
        5.0, False, 1.05, 17.21415952850114, 395.9256691555259,
    ),
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 1.0, "kappa": 1.0, "delta": 1.0},
        1.5, True, 1.05, 17.811527170588995, 399.5163583,
    ),
    PotentialTestCase(
        az.pair.ExpandedYukawa,
        {"epsilon": 1.0, "kappa": 1.0, "delta": 1.0},
        3.0, False, 4.0, 0.0, 0.0,
    ),
    # Hertz
    PotentialTestCase(az.pair.Hertz, {"epsilon": 2.0}, 1.5, False, 1.05, 0.0985, 0.5477),
    PotentialTestCase(az.pair.Hertz, {"epsilon": 3.0}, 2.05, False, 1.05, 0.4985, 1.2464),
    PotentialTestCase(az.pair.Hertz, {"epsilon": 1.0}, 1.0, False, 1.05, 0, 0),
    PotentialTestCase(az.pair.Hertz, {"epsilon": 0.0}, 3.0, False, 1.05, 0, 0),
    # PerturbedLennardJones
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 1.05, "attraction_scale_factor": 0.0},
        3.0, False, 1.05, 2.0, 45.7143,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 1.05, "attraction_scale_factor": 0.5},
        3.0, False, 1.05, 1.0, 45.7143,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 0.5, "attraction_scale_factor": 0.0},
        3.0, False, 1.05, 0, 0,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 0.5, "attraction_scale_factor": 0.5},
        3.0, False, 1.05, -0.0460947, -0.260291,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 1.05, "attraction_scale_factor": 0.5},
        3.0, True, 1.05, 1.00734, 45.7143,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 2.0, "sigma": 0.85, "attraction_scale_factor": 0.5},
        3.0, True, 1.05, -0.806849, -2.81197,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 1.0, "sigma": 1.0, "attraction_scale_factor": 0.5},
        1.0, False, 1.05, 0, 0,
    ),
    PotentialTestCase(
        az.pair.PerturbedLennardJones,
        {"epsilon": 0.0, "sigma": 1.0, "attraction_scale_factor": 0.5},
        3.0, False, 1.05, 0, 0,
    ),
]


@pytest.mark.parametrize(
    "potential_test", potential_tests, ids=lambda x: x.potential.__name__
)
def test_energy_and_force(
    simulation_factory, two_particle_snapshot_factory, potential_test
):
    r_cut = potential_test.r_cut
    r_buff = 0.4
    L_domain_min = 2 * (r_cut + r_buff)
    sim = simulation_factory(
        two_particle_snapshot_factory(d=potential_test.distance, L=2.1 * L_domain_min)
    )

    integrator = az.md.Integrator(dt=0.001)
    integrator.methods = [az.md.methods.ConstantVolume(az.filter.All())]

    extra_args = {}
    if potential_test.potential is az.pair.DPDGeneralWeight:
        extra_args["kT"] = 0.0
    else:
        extra_args["mode"] = "shift" if potential_test.shift else "none"

    potential = potential_test.potential(
        nlist=az.md.nlist.Cell(buffer=r_buff),
        default_r_cut=potential_test.r_cut,
        **extra_args,
    )
    potential.params[("A", "A")] = potential_test.params
    integrator.forces = [potential]

    sim.operations.integrator = integrator
    sim.run(0)

    # params survive attach
    got = potential.params[("A", "A")]
    for k, v in potential_test.params.items():
        assert got[k] == pytest.approx(v)

    # f32 engine: assert to 1e-5 relative (BASELINE parity target), with a
    # small absolute floor standing in for the reference's decimal=4.
    e = potential_test.energy
    numpy.testing.assert_allclose(
        potential.energies, [0.5 * e, 0.5 * e], rtol=3e-5, atol=1e-4
    )
    f = potential_test.force
    numpy.testing.assert_allclose(
        potential.forces, [[-f, 0, 0], [f, 0, 0]], rtol=3e-5, atol=1e-4
    )


def test_xplor_smoothing(simulation_factory, two_particle_snapshot_factory):
    """XPLOR mode: S(r)=1 below r_on, smooth to 0 at r_cut."""
    sim = simulation_factory(two_particle_snapshot_factory(d=2.5, L=20.0))
    integrator = az.md.Integrator(dt=0.001)
    integrator.methods = [az.md.methods.ConstantVolume(az.filter.All())]
    pot = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=3.0, default_r_on=2.0,
        mode="xplor",
    )
    pot.params[("A", "A")] = dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0)
    integrator.forces = [pot]
    sim.operations.integrator = integrator
    sim.run(0)

    # plain LJ values at r=2.5 (lambda=1): U and F, then apply S
    r, rc, ron = 2.5, 3.0, 2.0
    U = 4 * (r**-12 - r**-6)
    F = 24 * (2 * r**-13 - r**-7)
    num = (rc**2 - r**2) ** 2 * (rc**2 + 2 * r**2 - 3 * ron**2)
    den = (rc**2 - ron**2) ** 3
    S = num / den
    dS_divr = 12 * (r**2 - ron**2) * (rc**2 - r**2) / den
    U_s = U * S
    F_s = F * S + U * dS_divr * r
    numpy.testing.assert_allclose(pot.energies.sum(), U_s, rtol=1e-4, atol=1e-6)
    numpy.testing.assert_allclose(pot.forces[1][0], F_s, rtol=1e-4, atol=1e-6)
