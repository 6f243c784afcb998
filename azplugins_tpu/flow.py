"""Flow fields: position-dependent background velocity u(r).

Mirrors ``hoomd.azplugins.flow`` (/root/reference/src/flow.py:13-93):
ConstantFlow and ParabolicFlow, used by the Langevin/Brownian flow
integrators to drag particles relative to a moving solvent. A flow field
is a traceable callable ``u(position[..., 3]) -> velocity[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["FlowField", "ConstantFlow", "ParabolicFlow"]


class FlowField:
    """Base class: a velocity field evaluated inside the jitted step."""

    def __call__(self, position):  # pragma: no cover - interface
        raise NotImplementedError


class ConstantFlow(FlowField):
    """Uniform flow u(r) = U.

    Parity: /root/reference/src/ConstantFlow.h:48-51, src/flow.py:20-49.
    """

    def __init__(self, velocity):
        self.velocity = tuple(float(v) for v in velocity)
        if len(self.velocity) != 3:
            raise ValueError("velocity must have 3 components")

    def __call__(self, position):
        u = jnp.asarray(self.velocity, dtype=jnp.float32)
        return jnp.broadcast_to(u, position.shape)


class ParabolicFlow(FlowField):
    """Poiseuille flow between parallel plates separated along y:

    u_x(y) = 1.5 U (1 - (y / L)^2) with L = separation / 2.

    Parity: /root/reference/src/ParabolicFlow.h:69-93, src/flow.py:51-93.
    """

    def __init__(self, mean_velocity: float, separation: float):
        self.mean_velocity = float(mean_velocity)
        self.separation = float(separation)

    def __call__(self, position):
        U_max = jnp.float32(1.5 * self.mean_velocity)
        L = jnp.float32(0.5 * self.separation)
        yr = position[..., 1] / L
        ux = U_max * (1.0 - yr * yr)
        zeros = jnp.zeros_like(ux)
        return jnp.stack([ux, zeros, zeros], axis=-1)
