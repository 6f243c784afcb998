"""External potentials: harmonic barriers and wall potentials.

Rebuild of SURVEY §2.5 (active harmonic barriers) and §2.9 (legacy wall
potentials, required by the north star).

  * ``PlanarHarmonicBarrier`` / ``SphericalHarmonicBarrier``: one-sided
    harmonic restraints with a time-dependent (Variant) location; per-type
    ``k`` and ``offset`` params. The reference deliberately does not
    compute a virial for these (/root/reference/src/HarmonicBarrier.h:132-142)
    and neither do we (zeros + one-time warning).
  * ``wall.LJ93`` / ``wall.Colloid``: integrated LJ wall potentials acting
    on the perpendicular distance to planar walls
    (/root/reference/src/WallEvaluatorLJ93.h:110-136,
    /root/reference/src/WallEvaluatorColloid.h:114-151).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from .core.typeparam import TypeParameter
from .core.variant import Variant, as_variant
from .md.force import Force, SimContext, tables_to_device
from .ops.evaluators import BARRIERS, WALL_POTENTIALS
from .ops.pair_force import ForceResult

__all__ = [
    "HarmonicBarrier",
    "PlanarHarmonicBarrier",
    "SphericalHarmonicBarrier",
    "wall",
]


class HarmonicBarrier(Force):
    """Base: harmonic half-space barrier with variant location.

    Parity: /root/reference/src/external.py:16-80,
    /root/reference/src/HarmonicBarrier.h:25-178.
    """

    _barrier_name = ""

    def __init__(self, location):
        super().__init__()
        self.location: Variant = as_variant(location)
        self.params = TypeParameter("params", 1, {"k": float, "offset": float})
        self._def = BARRIERS[self._barrier_name]
        self._warned_virial = False

    def _build_tables(self, sim):
        types = sim._particle_types
        host = self.params.to_dict_tables(types)
        self._tbl = {"params": tables_to_device(host)}
        # validate the barrier stays inside the box over its range
        lo, hi = self.location.range()
        for extreme in (lo, hi):
            if np.isfinite(extreme) and not self._def.valid(extreme, sim._synced_state().box):
                raise ValueError(
                    f"{type(self).__name__}: location {extreme} is outside the global box"
                )
        if not self._warned_virial:
            warnings.warn(
                f"{type(self).__name__} does not compute the virial "
                "(matching reference behavior)",
                stacklevel=2,
            )
            self._warned_virial = True

    def _compute(self, state, nbr_idx, timestep, ctx: SimContext, tbl) -> ForceResult:
        loc = self.location(timestep)
        pos, _ = state.box.wrap(state.position, state.image)
        k = jnp.take(tbl["params"]["k"], state.typeid)
        offset = jnp.take(tbl["params"]["offset"], state.typeid)
        e, force = self._def.energy_force(pos, loc, k, offset)
        valid = state.tag >= 0  # dense layout: ignore empty slots
        e = jnp.where(valid, e, 0.0)
        force = jnp.where(valid[:, None], force, 0.0)
        return ForceResult(
            force=force,
            energy=e,
            virial=jnp.zeros((state.N, 6), jnp.float32),
        )


class PlanarHarmonicBarrier(HarmonicBarrier):
    """Pushes particles with y > H + offset back toward the plane.

    Parity: /root/reference/src/external.py:83-120,
    /root/reference/src/PlanarBarrierEvaluator.h:36-48.
    """

    _barrier_name = "Planar"


class SphericalHarmonicBarrier(HarmonicBarrier):
    """Pushes particles outside radius R + offset back inward.

    Parity: /root/reference/src/external.py:122-160,
    /root/reference/src/SphericalBarrierEvaluator.h:36-51.
    """

    _barrier_name = "Spherical"


# ---------------------------------------------------------------------------
# Wall potentials
# ---------------------------------------------------------------------------
class _Plane:
    """An infinite plane wall: points with dot(r - origin, normal) > 0 feel it."""

    def __init__(self, origin, normal):
        self.origin = tuple(float(x) for x in origin)
        n = np.asarray(normal, dtype=np.float64)
        n = n / np.linalg.norm(n)
        self.normal = tuple(n)

    def __repr__(self):
        return f"wall.Plane(origin={self.origin}, normal={self.normal})"


class _WallPotential(Force):
    """LJ-style potential between particles and a list of planar walls."""

    _wall_name = ""

    def __init__(self, walls):
        super().__init__()
        self.walls = list(walls)
        for w in self.walls:
            if not isinstance(w, _Plane):
                raise TypeError("walls must be wall.Plane instances")
        self._def = WALL_POTENTIALS[self._wall_name]
        spec = dict(self._def.spec)
        spec["r_cut"] = float
        self.params = TypeParameter("params", 1, spec)

    def _build_tables(self, sim):
        types = sim._particle_types
        host = self.params.to_dict_tables(types)
        r_cut = host.pop("r_cut")
        self._tbl = {
            "params": tables_to_device(self._def.precompute(host)),
            "r_cut": np.asarray(r_cut, dtype=np.float32),
        }

    def _compute(self, state, nbr_idx, timestep, ctx: SimContext, tbl) -> ForceResult:
        pos, _ = state.box.wrap(state.position, state.image)
        p = {k: jnp.take(v, state.typeid) for k, v in tbl["params"].items()}
        rcut = jnp.take(tbl["r_cut"], state.typeid)
        rcutsq = rcut * rcut

        force = jnp.zeros((state.N, 3), jnp.float32)
        energy = jnp.zeros((state.N,), jnp.float32)
        valid = state.tag >= 0  # dense layout: ignore empty slots
        for w in self.walls:
            origin = jnp.asarray(w.origin, dtype=jnp.float32)
            normal = jnp.asarray(w.normal, dtype=jnp.float32)
            r = jnp.sum((pos - origin) * normal, axis=-1)
            rsq = r * r
            mask = valid & (r > 0) & (rsq < rcutsq)
            rsq_safe = jnp.where(mask, rsq, 1.0)
            e, f_divr = self._def.energy_force(rsq_safe, rcutsq, p, state.diameter)
            # force along +normal with magnitude f_divr * r
            force = force + jnp.where(mask, f_divr * r, 0.0)[:, None] * normal
            energy = energy + jnp.where(mask, e, 0.0)
        return ForceResult(
            force=force, energy=energy, virial=jnp.zeros((state.N, 6), jnp.float32)
        )


class _LJ93Wall(_WallPotential):
    """9-3 integrated LJ wall: U = (2/15) eps (s/r)^9 - eps (s/r)^3 terms.

    Parity: /root/reference/src/WallEvaluatorLJ93.h:110-136.
    """

    _wall_name = "LJ93"


class _ColloidWall(_WallPotential):
    """Integrated sphere/half-space LJ wall; uses the particle diameter.

    Parity: /root/reference/src/WallEvaluatorColloid.h:114-151.
    """

    _wall_name = "Colloid"
    _needs_diameter = True


class _WallNamespace:
    Plane = _Plane
    LJ93 = _LJ93Wall
    Colloid = _ColloidWall


wall = _WallNamespace()
