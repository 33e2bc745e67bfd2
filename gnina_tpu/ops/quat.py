"""Quaternion math as pure JAX functions over (..., 4) arrays (w, x, y, z).

Reproduces the reference quaternion semantics (reference:
gninasrc/lib/quaternion.h, quaternion.cu) — including the approximate
normalization and the rotation-vector increment convention used by the
optimizer — but vectorized over arbitrary batch shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gnina_tpu.constants import EPSILON_FL

# numpy, not jnp: a module-level jnp constant initializes the XLA
# backend at import, which breaks jax.distributed.initialize in the
# multi-host CLI path (it must run before any backend touch)
QT_IDENTITY = np.array([1.0, 0.0, 0.0, 0.0], np.float32)


def qmul(q, r):
    """Hamilton product, broadcasting over leading dims."""
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ar, br, cr, dr = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack([
        a * ar - b * br - c * cr - d * dr,
        a * br + b * ar + c * dr - d * cr,
        a * cr - b * dr + c * ar + d * br,
        a * dr + b * cr - c * br + d * ar,
    ], axis=-1)


def qconj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def qnorm_sqr(q):
    return jnp.sum(q * q, axis=-1)


def qnormalize_approx(q, tolerance=1e-6):
    """Normalize only if norm deviates from 1 (quaternion.h:242-257)."""
    s = qnorm_sqr(q)
    needs = jnp.abs(s - 1.0) >= tolerance
    scale = jnp.where(needs, 1.0 / jnp.sqrt(jnp.maximum(s, EPSILON_FL)), 1.0)
    return q * scale[..., None]


def normalize_angle(x):
    """Wrap angle into [-pi, pi] (quaternion.h:259-281)."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def axis_angle_to_quaternion(axis, angle):
    """Unit axis + angle -> quaternion (quaternion.h:283-291)."""
    angle = normalize_angle(angle)
    c = jnp.cos(angle / 2.0)
    s = jnp.sin(angle / 2.0)
    return jnp.concatenate([c[..., None], s[..., None] * axis], axis=-1)


def rotvec_to_quaternion(rotation):
    """Rotation vector (angle*axis) -> quaternion (quaternion.cu:32-43).

    Uses a Taylor-safe sinc form so it is differentiable at zero rotation —
    required because the optimizer differentiates w.r.t. a zero increment.
    """
    angle_sq = jnp.sum(rotation * rotation, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-30))
    small = angle < 1e-6
    half = angle / 2.0
    c = jnp.cos(half)
    # sin(angle/2)/angle, series 0.5 - angle^2/48 near zero
    sinc_half = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    return jnp.concatenate([c[..., None], sinc_half[..., None] * rotation], axis=-1)


def quaternion_to_rotvec(q):
    """Quaternion -> rotation vector in (-pi, pi] (quaternion.cu:46-62)."""
    c = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(c)
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    s = jnp.sin(angle / 2.0)
    safe = jnp.abs(s) >= EPSILON_FL
    scale = jnp.where(safe, angle / jnp.where(safe, s, 1.0), 0.0)
    inrange = jnp.logical_and(c > -1.0, c < 1.0)
    return jnp.where(inrange[..., None], scale[..., None] * q[..., 1:], 0.0)


def quaternion_increment(q, rotation):
    """q <- normalize(quat(rotation) * q) (quaternion.cu:99-103)."""
    return qnormalize_approx(qmul(rotvec_to_quaternion(rotation), q))


def quaternion_to_matrix(q):
    """Rotation matrix (..., 3, 3) from quaternion (quaternion.h:326-364)."""
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    aa, bb, cc, dd = a * a, b * b, c * c, d * d
    ab, ac, ad = a * b, a * c, a * d
    bc, bd, cd = b * c, b * d, c * d
    row0 = jnp.stack([aa + bb - cc - dd, 2 * (-ad + bc), 2 * (ac + bd)], axis=-1)
    row1 = jnp.stack([2 * (ad + bc), aa - bb + cc - dd, 2 * (-ab + cd)], axis=-1)
    row2 = jnp.stack([2 * (-ac + bd), 2 * (ab + cd), aa - bb - cc + dd], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def qrotate(q, v):
    """Rotate vectors v (..., 3) by quaternion q (broadcasting)."""
    m = quaternion_to_matrix(q)
    return jnp.einsum("...ij,...j->...i", m, v)


def random_orientation(key):
    """Uniform random unit quaternion(s) (quaternion.cu:83-96)."""
    import jax

    g = jax.random.normal(key, (4,), jnp.float32)
    n = jnp.sqrt(jnp.maximum(jnp.sum(g * g), EPSILON_FL))
    return g / n
