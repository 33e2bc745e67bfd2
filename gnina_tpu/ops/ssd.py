"""Legacy adaptive steepest-descent minimizer.

Reference: gninasrc/lib/ssd.h:29-47, ssd.cpp:26-45 — Vina's pre-BFGS
minimizer, kept for parity with `minimization_params::type == Simple`.
Step factor grows by `up` on improvement, shrinks by `down` on rejection,
terminates after `evals` trials or when the factor drops below
`min_factor`.  Batched use is `vmap(lambda c: ssd(f, c, params))`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from gnina_tpu.ops.fk import conf_increment
from gnina_tpu.types import Conf


@dataclasses.dataclass(frozen=True)
class SSDParams:
    evals: int = 300
    initial_factor: float = 1e-4
    min_factor: float = 1e-6
    up: float = 1.6
    down: float = 0.5


class SSDResult(NamedTuple):
    x: Conf
    f0: jnp.ndarray
    g: jnp.ndarray


def ssd(f: Callable, x0: Conf, params: SSDParams = SSDParams(),
        dof_mask=None) -> SSDResult:
    """Minimize f over pose DOF (ssd.cpp:26-45).

    f: Conf -> (energy, flat gradient (D,)).
    """
    f0, g0 = f(x0)
    if dof_mask is not None:
        g0 = jnp.where(dof_mask, g0, 0.0)

    class State(NamedTuple):
        i: jnp.ndarray
        x: Conf
        e: jnp.ndarray
        g: jnp.ndarray
        factor: jnp.ndarray

    def cond(s: State):
        return jnp.logical_and(s.i < params.evals,
                               s.factor >= params.min_factor)

    def body(s: State):
        cand = conf_increment(s.x, s.g, -s.factor)
        e_c, g_c = f(cand)
        if dof_mask is not None:
            g_c = jnp.where(dof_mask, g_c, 0.0)
        better = e_c <= s.e
        x_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), cand, s.x)
        return State(
            i=s.i + 1,
            x=x_new,
            e=jnp.where(better, e_c, s.e),
            g=jnp.where(better, g_c, s.g),
            factor=s.factor * jnp.where(better, params.up, params.down),
        )

    init = State(i=jnp.int32(0), x=x0, e=f0, g=g0,
                 factor=jnp.float32(params.initial_factor))
    final = jax.lax.while_loop(cond, body, init)
    return SSDResult(x=final.x, f0=final.e, g=final.g)
