"""End-to-end triclinic (tilted) box coverage.

Tilted boxes take the masked dense path (explicit validity masks +
per-pair minimum image, ops/dense.py `_offset_geometry` with
``preshifted=False`` when any axis has < 3 cells, else tilted-shift
halo). Forces are cross-checked against an O(N^2) float64 brute force
using the HOOMD triclinic minimum-image convention, and NVE conserves
energy over hundreds of steps.
"""

import numpy as np
import pytest

import azplugins_tpu as az


def _min_image(d, L, tilt):
    """HOOMD triclinic minimum image (float64)."""
    Lx, Ly, Lz = L
    xy, xz, yz = tilt
    # order matters: z, then y, then x (a3, a2, a1)
    img = np.rint(d[:, 2] / Lz)
    d = d - img[:, None] * np.array([xz * Lz, yz * Lz, Lz])
    img = np.rint(d[:, 1] / Ly)
    d = d - img[:, None] * np.array([xy * Ly, Ly, 0.0])
    img = np.rint(d[:, 0] / Lx)
    d = d - img[:, None] * np.array([Lx, 0.0, 0.0])
    return d


def _brute_force_lj(pos, L, tilt, eps, sig, lam, r_cut):
    N = len(pos)
    forces = np.zeros((N, 3))
    lj1 = 4 * eps * sig**12
    lj2 = 4 * eps * sig**6
    for i in range(N):
        d = pos[i] - pos  # [N, 3]
        d = _min_image(d, L, tilt)
        rsq = (d * d).sum(axis=1)
        rsq[i] = 1e30
        mask = rsq < r_cut * r_cut
        r6 = np.where(mask, rsq, 1.0) ** -3
        f = r6 * (12 * lj1 * r6 - 6 * lj2) / np.where(mask, rsq, 1.0)
        in_core = rsq < 2 ** (1 / 3) * sig * sig
        f = np.where(in_core, f, f * lam)
        f = np.where(mask, f, 0.0)
        forces[i] = (f[:, None] * d).sum(axis=0)
    return forces


@pytest.mark.parametrize("tilt", [(0.3, 0.0, 0.0), (0.2, -0.15, 0.25)])
def test_tilted_box_forces_match_brute_force(tilt):
    rng = np.random.default_rng(31)
    N = 200
    L = (9.0, 8.5, 9.5)
    snap = az.Snapshot(N=N)
    snap.configuration.box = list(L) + list(tilt)
    snap.particles.types = ["A"]
    # fractional fill of the tilted box
    frac = rng.random((N, 3)) - 0.5
    Lx, Ly, Lz = L
    xy, xz, yz = tilt
    x = frac[:, 0] * Lx + frac[:, 1] * xy * Ly + frac[:, 2] * xz * Lz
    y = frac[:, 1] * Ly + frac[:, 2] * yz * Lz
    z = frac[:, 2] * Lz
    pos = np.stack([x, y, z], axis=1)
    snap.particles.position[:] = pos

    sim = az.Simulation(seed=2)
    sim.create_state_from_snapshot(snap)
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5
    )
    lj.params[("A", "A")] = dict(
        epsilon=1.0, sigma=1.0, attraction_scale_factor=0.5
    )
    sim.operations.integrator = az.md.Integrator(
        dt=0.001, methods=[az.md.methods.ConstantVolume()], forces=[lj]
    )
    sim.run(0)
    got = np.asarray(lj.forces)
    ref = _brute_force_lj(pos, L, tilt, 1.0, 1.0, 0.5, 2.5)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale, rtol=5e-5)


def test_tilted_box_nve_conserves_energy():
    rng = np.random.default_rng(8)
    N = 300
    snap = az.Snapshot(N=N)
    snap.configuration.box = [10.0, 10.0, 10.0, 0.25, 0.1, -0.2]
    # overlap-free-ish start: jittered lattice in fractional coords
    n = 7
    g = (np.arange(n) + 0.5) / n - 0.5
    grid = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    frac = grid[:N] + rng.normal(0, 0.01, (N, 3))
    Lx = Ly = Lz = 10.0
    xy, xz, yz = 0.25, 0.1, -0.2
    x = frac[:, 0] * Lx + frac[:, 1] * xy * Ly + frac[:, 2] * xz * Lz
    y = frac[:, 1] * Ly + frac[:, 2] * yz * Lz
    z = frac[:, 2] * Lz
    snap.particles.types = ["A"]
    snap.particles.position[:] = np.stack([x, y, z], axis=1)

    sim = az.Simulation(seed=4)
    sim.create_state_from_snapshot(snap)
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5, mode="shift"
    )
    lj.params[("A", "A")] = dict(
        epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0
    )
    sim.operations.integrator = az.md.Integrator(
        dt=0.002, methods=[az.md.methods.ConstantVolume()], forces=[lj]
    )
    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    sim.state.thermalize_particle_momenta(kT=0.5)
    sim.run(10)
    e0 = thermo.kinetic_energy + lj.energy
    sim.run(400)
    e1 = thermo.kinetic_energy + lj.energy
    assert abs(e1 - e0) / N < 5e-3, (e0, e1)
