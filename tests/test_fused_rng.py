"""Fast-tier unit tests for the fused-kernel RNG helper.

The in-kernel MC draws uniforms from raw TPU PRNG bits; the raw bits are
typed int32, so the conversion must mask off the sign (ADVICE r2: an
arithmetic shift made ~half the draws negative, biasing mutation DOF
selection and making metropolis accept ~50% of uphill moves).
"""

import numpy as np
import jax.numpy as jnp

from gnina_tpu.ops.pallas_dock import u01_from_bits


def test_u01_negative_bits_stay_in_unit_interval():
    bits = jnp.asarray(np.array(
        [np.iinfo(np.int32).min, -1, -123456789, 0, 1,
         np.iinfo(np.int32).max], np.int32))
    u = np.asarray(u01_from_bits(bits))
    assert np.all(u >= 0.0)
    assert np.all(u < 1.0)


def test_u01_uniform_statistics():
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(np.iinfo(np.int32).min,
                                    np.iinfo(np.int32).max,
                                    size=200_000, dtype=np.int64)
                       .astype(np.int32))
    u = np.asarray(u01_from_bits(bits))
    assert np.all((u >= 0.0) & (u < 1.0))
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 5e-3
