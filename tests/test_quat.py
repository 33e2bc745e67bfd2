"""Quaternion op tests: rotation semantics, increments, round trips."""

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.ops import quat as Q


def test_identity_rotation():
    v = jnp.array([1.0, 2.0, 3.0])
    out = Q.qrotate(Q.QT_IDENTITY, v)
    assert np.allclose(np.asarray(out), [1, 2, 3], atol=1e-6)


def test_axis_angle_90deg_z():
    q = Q.axis_angle_to_quaternion(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    out = np.asarray(Q.qrotate(q, jnp.array([1.0, 0.0, 0.0])))
    assert np.allclose(out, [0, 1, 0], atol=1e-6)


def test_rotvec_roundtrip():
    rv = jnp.array([0.3, -0.2, 0.5])
    q = Q.rotvec_to_quaternion(rv)
    back = np.asarray(Q.quaternion_to_rotvec(q))
    assert np.allclose(back, np.asarray(rv), atol=1e-5)


def test_rotvec_zero_is_identity_and_differentiable():
    q = Q.rotvec_to_quaternion(jnp.zeros(3))
    assert np.allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)

    def f(rv):
        q = Q.rotvec_to_quaternion(rv)
        return jnp.sum(Q.qrotate(q, jnp.array([1.0, 2.0, 3.0])) * jnp.array([0.5, -1.0, 2.0]))

    g = np.asarray(jax.grad(f)(jnp.zeros(3)))
    assert np.all(np.isfinite(g))
    # dE/dr = sum over rotated points of (x cross gradE) -> x cross w
    x = np.array([1.0, 2.0, 3.0])
    w = np.array([0.5, -1.0, 2.0])
    assert np.allclose(g, np.cross(x, w), atol=1e-4)


def test_qmul_matches_matrix_composition():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    q1 = Q.random_orientation(k1)
    q2 = Q.random_orientation(k2)
    m12 = np.asarray(Q.quaternion_to_matrix(Q.qmul(q1, q2)))
    m1 = np.asarray(Q.quaternion_to_matrix(q1))
    m2 = np.asarray(Q.quaternion_to_matrix(q2))
    assert np.allclose(m12, m1 @ m2, atol=1e-5)


def test_quaternion_increment_normalized():
    q = Q.random_orientation(jax.random.PRNGKey(3))
    q2 = Q.quaternion_increment(q, jnp.array([0.1, 0.2, -0.3]))
    assert np.allclose(float(Q.qnorm_sqr(q2)), 1.0, atol=1e-5)


def test_batched_ops():
    qs = jnp.tile(Q.QT_IDENTITY, (5, 1))
    vs = jnp.ones((5, 3))
    out = Q.qrotate(qs, vs)
    assert out.shape == (5, 3)
    assert np.allclose(np.asarray(out), 1.0, atol=1e-6)


def test_normalize_angle():
    xs = np.array([0.0, 3.5, -3.5, 7.0, 100.0], np.float32)
    out = np.asarray(Q.normalize_angle(jnp.array(xs)))
    assert np.all(out >= -np.pi - 1e-5)
    assert np.all(out <= np.pi + 1e-5)
    assert np.allclose(np.sin(out), np.sin(xs), atol=1e-4)
    assert np.allclose(np.cos(out), np.cos(xs), atol=1e-4)
