"""Computes: center-of-mass velocity, binned velocity fields, thermo.

Mirrors ``hoomd.azplugins.compute`` (/root/reference/src/compute.py) plus a
minimal ThermodynamicQuantities (the HOOMD substrate quantity used by the
reference's DPD statistical test, src/pytest/test_pair_dpd.py:19-46).

All computes are lazy pull-path observables (SURVEY §3.3): accessing the
property runs a small jitted reduction on the current state. Multi-device
meshes reduce with psum instead of the reference's MPI_Allreduce
(/root/reference/src/VelocityCompute.cc:50-63).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .md.filter import All, ParticleFilter
from .ops.binning import bin_particles, cartesian_coords, cylindrical_coords

__all__ = [
    "VelocityCompute",
    "VelocityFieldCompute",
    "CartesianVelocityFieldCompute",
    "CylindricalVelocityFieldCompute",
    "ThermodynamicQuantities",
]


class Compute:
    def __init__(self):
        self._sim = None
        self._attached = False

    def _attach(self, sim):
        self._sim = sim
        self._attached = True

    def _require_attached(self, what: str):
        if not self._attached:
            raise RuntimeError(f"{what} is not available before attaching (run sim.run(0))")


class VelocityCompute(Compute):
    """Center-of-mass velocity of a particle group.

    Parity: /root/reference/src/compute.py:18-91,
    /root/reference/src/VelocityCompute.cc:50-76.
    """

    def __init__(self, filter: ParticleFilter | None = None, include_mpcd_particles=False):
        super().__init__()
        if include_mpcd_particles:
            raise NotImplementedError("MPCD particles are not part of the TPU engine yet")
        self.filter = filter if filter is not None else All()
        self._mask = None

    def _attach(self, sim):
        super()._attach(sim)
        typeids = np.asarray(sim._synced_state().typeid)
        self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @property
    def velocity(self):
        self._require_attached("velocity")
        state = self._sim._synced_state()
        return np.asarray(_group_velocity(state.velocity, state.mass, self._mask))


class VelocityFieldCompute(Compute):
    """Mass-averaged velocity field on a <=3D grid. Use a derived type.

    Parity: /root/reference/src/compute.py:94-246,
    /root/reference/src/VelocityFieldCompute.h:27-353.
    """

    _coord_fn = None

    def __init__(self, num_bins, lower_bounds, upper_bounds, filter=None,
                 include_mpcd_particles=False):
        super().__init__()
        if include_mpcd_particles:
            raise NotImplementedError("MPCD particles are not part of the TPU engine yet")
        self.num_bins = tuple(int(b) for b in num_bins)
        self.lower_bounds = tuple(float(b) for b in lower_bounds)
        self.upper_bounds = tuple(float(b) for b in upper_bounds)
        if len(self.num_bins) != 3:
            raise ValueError("num_bins must have 3 entries")
        self.filter = filter
        self._mask = None
        self._calc_jit = None

    def _attach(self, sim):
        super()._attach(sim)
        typeids = np.asarray(sim._synced_state().typeid)
        if self.filter is None:
            self._mask = jnp.zeros(typeids.shape[0], dtype=bool)
        else:
            self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @property
    def coordinates(self):
        """Bin center coordinates (compact shape, like the reference)."""
        coords = []
        shape = []
        for num, lo, hi in zip(self.num_bins, self.lower_bounds, self.upper_bounds):
            if num > 0:
                x, dx = np.linspace(lo, hi, num, endpoint=False, retstep=True)
                x = x + 0.5 * dx
                coords.append(x)
                shape.append(num)
        if len(shape) == 0:
            return None
        if len(shape) > 1:
            shape.append(len(shape))
        return np.reshape(list(itertools.product(*coords)), shape)

    def _compact_shape(self):
        return tuple(b for b in self.num_bins if b > 0)

    @property
    def velocities(self):
        self._require_attached("velocities")
        state = self._sim._synced_state()
        if self._calc_jit is None:
            num_bins = self.num_bins
            lower = self.lower_bounds
            upper = self.upper_bounds
            coord_fn = type(self)._coord_fn

            def _calc(position, velocity, mass, image, mask, box):
                pos, _ = box.wrap(position, image)
                coords, vel = coord_fn(pos, velocity)
                mass_grid, mom_grid = bin_particles(
                    coords, vel, mass, mask, num_bins, lower, upper
                )
                m_safe = jnp.where(mass_grid > 0, mass_grid, 1.0)
                return jnp.where(
                    (mass_grid > 0)[:, None], mom_grid / m_safe[:, None], 0.0
                )

            # cache the jitted wrapper: jax.jit caches per wrapper object
            self._calc_jit = jax.jit(_calc)
        v = np.asarray(
            self._calc_jit(
                state.position, state.velocity, state.mass, state.image,
                self._mask, state.box,
            )
        )
        return v.reshape((*self._compact_shape(), 3))


class CartesianVelocityFieldCompute(VelocityFieldCompute):
    """Velocity field binned in (x, y, z). Parity: src/compute.py:249-280."""

    _coord_fn = staticmethod(cartesian_coords)


class CylindricalVelocityFieldCompute(VelocityFieldCompute):
    """Velocity field binned in (r, theta, z) with rotated velocity basis.

    Parity: src/compute.py:281-330,
    /root/reference/src/CylindricalBinningOperation.h:43-75.
    """

    _coord_fn = staticmethod(cylindrical_coords)


class ThermodynamicQuantities(Compute):
    """Kinetic temperature / energies of a group (HOOMD-substrate parity)."""

    def __init__(self, filter: ParticleFilter | None = None):
        super().__init__()
        self.filter = filter if filter is not None else All()
        self._mask = None

    def _attach(self, sim):
        super()._attach(sim)
        typeids = np.asarray(sim._synced_state().typeid)
        self._mask = jnp.asarray(self.filter.mask(typeids, sim._particle_types))

    @property
    def kinetic_energy(self) -> float:
        self._require_attached("kinetic_energy")
        state = self._sim._synced_state()
        m = jnp.where(self._mask, state.mass, 0.0)
        ke = 0.5 * jnp.sum(m * jnp.sum(state.velocity**2, axis=-1))
        return float(ke)

    @property
    def translational_degrees_of_freedom(self) -> float:
        self._require_attached("translational_degrees_of_freedom")
        # COM momentum is conserved for the NVE/Langevin set: 3N - 3
        n = int(np.asarray(jnp.sum(self._mask.astype(jnp.int32))))
        return 3.0 * n - 3.0

    @property
    def kinetic_temperature(self) -> float:
        return 2.0 * self.kinetic_energy / self.translational_degrees_of_freedom

    @property
    def potential_energy(self) -> float:
        self._require_attached("potential_energy")
        sim = self._sim
        total = 0.0
        if sim.operations.integrator is not None:
            for f in sim.operations.integrator.forces:
                total += f.energy
        return total


@jax.jit
def _group_velocity(vel, mass, mask):
    m = jnp.where(mask, mass, 0.0)
    mom = jnp.sum(vel * m[:, None], axis=0)
    mtot = jnp.sum(m)
    return mom / jnp.maximum(mtot, 1e-38)
