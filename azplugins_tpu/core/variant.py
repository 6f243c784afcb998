"""Time-dependent scalar parameters ("variants").

Replaces the HOOMD ``Variant`` substrate consumed by the reference
(`location` of HarmonicBarrier, /root/reference/src/external.py:54-58; `kT`
of the DPD thermostat, /root/reference/src/pair.py:232) plus azplugins'
own ``VariantSphereArea`` (/root/reference/src/VariantSphereArea.cc:18-41).

A variant is evaluated *inside* the jitted timestep, so ``__call__`` must
be written with jnp ops on a traced integer timestep. Subclass ``Variant``
and override ``__call__`` for custom schedules (mirrors hoomd custom
variants used in the reference tests, src/pytest/test_external.py:11-28).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Variant", "Constant", "Ramp", "Cycle", "Power", "SphereArea", "as_variant"]


class Variant:
    """Base class: a scalar function of the integer timestep."""

    def __call__(self, timestep):  # pragma: no cover - interface
        raise NotImplementedError

    def range(self):
        """(min, max) bounds if known, for host-side validation."""
        return (-jnp.inf, jnp.inf)


class Constant(Variant):
    def __init__(self, value: float):
        self.value = float(value)

    def __call__(self, timestep):
        return jnp.float32(self.value)

    def range(self):
        return (self.value, self.value)

    def __eq__(self, other):
        return isinstance(other, Constant) and self.value == other.value


class Ramp(Variant):
    """Linear ramp from A to B over t_ramp steps starting at t_start."""

    def __init__(self, A: float, B: float, t_start: int, t_ramp: int):
        self.A = float(A)
        self.B = float(B)
        self.t_start = int(t_start)
        self.t_ramp = int(t_ramp)

    def __call__(self, timestep):
        t = jnp.asarray(timestep, dtype=jnp.float32)
        frac = jnp.clip((t - self.t_start) / self.t_ramp, 0.0, 1.0)
        return jnp.float32(self.A) + frac * jnp.float32(self.B - self.A)

    def range(self):
        return (min(self.A, self.B), max(self.A, self.B))


class Cycle(Variant):
    """Periodic triangle wave between A and B."""

    def __init__(self, A: float, B: float, t_start: int, t_A: int, t_AB: int, t_B: int, t_BA: int):
        self.A, self.B = float(A), float(B)
        self.t_start = int(t_start)
        self.t_A, self.t_AB, self.t_B, self.t_BA = int(t_A), int(t_AB), int(t_B), int(t_BA)

    def __call__(self, timestep):
        period = self.t_A + self.t_AB + self.t_B + self.t_BA
        t = jnp.maximum(jnp.asarray(timestep, jnp.int32) - self.t_start, 0) % period
        t = t.astype(jnp.float32)
        a, b = jnp.float32(self.A), jnp.float32(self.B)
        # piecewise: hold A, ramp A->B, hold B, ramp B->A
        e0 = jnp.float32(self.t_A)
        e1 = e0 + jnp.float32(self.t_AB)
        e2 = e1 + jnp.float32(self.t_B)
        up = a + (b - a) * jnp.clip((t - e0) / max(self.t_AB, 1), 0.0, 1.0)
        down = b + (a - b) * jnp.clip((t - e2) / max(self.t_BA, 1), 0.0, 1.0)
        return jnp.where(t < e1, up, jnp.where(t < e2, b, down))

    def range(self):
        return (min(self.A, self.B), max(self.A, self.B))


class Power(Variant):
    """Power-law interpolation from A to B over t_ramp steps."""

    def __init__(self, A: float, B: float, power: float, t_start: int, t_ramp: int):
        self.A, self.B = float(A), float(B)
        self.power = float(power)
        self.t_start = int(t_start)
        self.t_ramp = int(t_ramp)

    def __call__(self, timestep):
        t = jnp.asarray(timestep, dtype=jnp.float32)
        frac = jnp.clip((t - self.t_start) / self.t_ramp, 0.0, 1.0)
        return jnp.float32(self.A) + (frac**self.power) * jnp.float32(self.B - self.A)

    def range(self):
        return (min(self.A, self.B), max(self.A, self.B))


class SphereArea(Variant):
    """Radius of a sphere whose *area* changes at constant rate alpha.

    R(t) = sqrt(max(R0^2 - (alpha / 4 pi) t, 0)) — the droplet-evaporation
    schedule of the reference (/root/reference/src/VariantSphereArea.cc:18-41).
    """

    def __init__(self, R0: float, alpha: float):
        if R0 < 0:
            raise ValueError("R0 must be non-negative")
        self.R0 = float(R0)
        self.alpha = float(alpha)

    def __call__(self, timestep):
        R0_sq = jnp.float32(self.R0 * self.R0)
        k = jnp.float32(self.alpha / (4.0 * 3.141592653589793))
        drsq = k * jnp.asarray(timestep, dtype=jnp.float32)
        return jnp.sqrt(jnp.maximum(R0_sq - drsq, 0.0))

    def range(self):
        return (0.0, self.R0) if self.alpha >= 0 else (self.R0, jnp.inf)


def as_variant(value) -> Variant:
    """Coerce a float or Variant to a Variant (HOOMD-style preprocessing)."""
    if isinstance(value, Variant):
        return value
    if isinstance(value, (int, float)):
        return Constant(float(value))
    raise TypeError(f"cannot interpret {value!r} as a variant")
