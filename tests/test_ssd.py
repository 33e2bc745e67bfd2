"""Legacy ssd minimizer (ssd.cpp semantics) on a quadratic toy objective."""

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.ops.ssd import SSDParams, ssd
from gnina_tpu.types import Conf


def _quad_objective(center):
    """Energy = |pos - center|^2 + |torsions|^2 over conf DOF."""

    def f(conf: Conf):
        d = conf.position - center
        e = jnp.sum(d * d) + jnp.sum(conf.torsions ** 2)
        g = jnp.concatenate([2 * d, jnp.zeros(3), 2 * conf.torsions])
        return e, g

    return f


def test_ssd_descends_quadratic():
    center = jnp.asarray([1.0, -2.0, 0.5], jnp.float32)
    f = _quad_objective(center)
    x0 = Conf(position=jnp.zeros(3, jnp.float32),
              orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
              torsions=jnp.asarray([0.4, -0.3], jnp.float32))
    res = jax.jit(lambda c: ssd(f, c, SSDParams(evals=300)))(x0)
    e0, _ = f(x0)
    assert float(res.f0) < float(e0) * 0.05
    np.testing.assert_allclose(np.asarray(res.x.position),
                               np.asarray(center), atol=0.05)


def test_ssd_factor_collapse_terminates():
    """A non-improvable point shrinks the factor below min_factor and
    returns the original (ssd.cpp:31: break on factor < min_factor)."""
    f = _quad_objective(jnp.zeros(3, jnp.float32))
    x0 = Conf(position=jnp.zeros(3, jnp.float32),
              orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
              torsions=jnp.zeros(2, jnp.float32))
    res = jax.jit(lambda c: ssd(f, c))(x0)
    assert float(res.f0) == 0.0

    # dof_mask freezes everything: no movement even from a bad point
    x1 = Conf(position=jnp.ones(3, jnp.float32),
              orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
              torsions=jnp.ones(2, jnp.float32))
    mask = jnp.zeros(8, bool)  # D = 3 pos + 3 rot + 2 torsions
    res1 = jax.jit(lambda c: ssd(f, c, dof_mask=mask))(x1)
    np.testing.assert_allclose(np.asarray(res1.x.position),
                               np.asarray(x1.position))
