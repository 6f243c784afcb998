"""Triggers: jit-evaluable schedules for updaters/writers.

Minimal rebuild of hoomd's Trigger family; ``__call__`` takes a traced
timestep and must return a traced bool (evaluated inside the step loop).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Trigger", "Periodic", "After", "Before", "On", "as_trigger"]


class Trigger:
    def __call__(self, timestep):  # pragma: no cover - interface
        raise NotImplementedError


class Periodic(Trigger):
    def __init__(self, period: int, phase: int = 0):
        if period <= 0:
            raise ValueError("period must be positive")
        self.period = int(period)
        self.phase = int(phase)

    def __call__(self, timestep):
        t = jnp.asarray(timestep, jnp.int32)
        return (t - self.phase) % self.period == 0


class After(Trigger):
    def __init__(self, timestep: int):
        self.timestep = int(timestep)

    def __call__(self, timestep):
        return jnp.asarray(timestep, jnp.int32) > self.timestep


class Before(Trigger):
    def __init__(self, timestep: int):
        self.timestep = int(timestep)

    def __call__(self, timestep):
        return jnp.asarray(timestep, jnp.int32) < self.timestep


class On(Trigger):
    def __init__(self, timestep: int):
        self.timestep = int(timestep)

    def __call__(self, timestep):
        return jnp.asarray(timestep, jnp.int32) == self.timestep


def as_trigger(value) -> Trigger:
    if isinstance(value, Trigger):
        return value
    if isinstance(value, int):
        return Periodic(value)
    raise TypeError(f"cannot interpret {value!r} as a trigger")
