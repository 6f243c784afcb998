"""Quaternion helpers (w, x, y, z convention, HOOMD-compatible).

Used by the anisotropic pair kernel to rotate body-frame patch directions
into the space frame (reference behavior at
/root/reference/src/AnisoPairEvaluatorTwoPatchMorse.h:145-146).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rotate", "rotate_x"]


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2 u x (u x v + w v)
    t = jnp.cross(u, v) + w * v
    return v + 2.0 * jnp.cross(u, t)


def rotate_x(q: jnp.ndarray) -> jnp.ndarray:
    """Rotate the body-frame x axis (1,0,0); cheaper closed form."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    nx = 1.0 - 2.0 * (y * y + z * z)
    ny = 2.0 * (x * y + w * z)
    nz = 2.0 * (x * z - w * y)
    return jnp.stack([nx, ny, nz], axis=-1)
