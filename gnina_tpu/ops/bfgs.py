"""Batched dense BFGS over pose DOF, with Vina's two line searches.

TPU-native replacement for the reference's templated CPU/GPU BFGS
(reference: gninasrc/lib/bfgs.h:357-502, fast_line_search :73-91,
accurate_line_search :107-180, bfgs_update :52-66).  Written as single-pose
functions over a fixed DOF dimension D = 6 + T_pad, intended to be `vmap`ed
over thousands of poses and `jit`ed as part of the full docking program.
The D x D inverse-Hessian update is a few fused outer products — ideal VPU
work; all control flow is `lax.while_loop` with per-lane masking.

Cost note: the reference evaluates energy AND gradient at every line-search
trial but only consumes the gradient of the accepted point; here trials are
forward-only and the gradient is computed once after acceptance — same
floats, ~2-3x fewer FLOPs per trial.

NaN-safety: the final "restore if not improved" check (bfgs.h:491-495)
is preserved — it also recovers from NaN energies.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gnina_tpu.constants import EPSILON_FL
from gnina_tpu.ops.fk import conf_increment
from gnina_tpu.types import Conf


@dataclasses.dataclass(frozen=True)
class MinimizeParams:
    maxiters: int = 20
    type: str = "fast"          # "fast" | "accurate"
    early_term: bool = False
    single_min: bool = False
    # fused_trials: evaluate value AND gradient at all 10 Armijo trials in
    # one batched call, so each BFGS iteration is ONE device program segment
    # instead of two sequential ones (trial energies, then the gradient at
    # the accepted point).  More FLOPs, half the sequential fusion depth —
    # a win in the launch-bound regime these tiny per-pose tensors live in.
    fused_trials: bool = True


class LineSearchResult(NamedTuple):
    alpha: jnp.ndarray
    x_new: Conf
    f1: jnp.ndarray


def fast_line_search(f_val: Callable, x: Conf, g, f0, p) -> LineSearchResult:
    """Backtracking Armijo search (bfgs.h:73-91): up to 10 halvings.

    All 10 candidate step sizes are known in advance (alpha = 0.5^k), so the
    trials are evaluated as ONE batched call and the first acceptable alpha
    selected — identical floats to the reference's sequential loop, but no
    lockstep-serialized while_loop when vmapped over thousands of poses.
    """
    c0 = 1e-4
    pg = jnp.dot(p, g)
    alphas = 0.5 ** jnp.arange(10, dtype=jnp.float32)

    xs = jax.vmap(lambda a: conf_increment(x, p, a))(alphas)
    f1s = jax.vmap(f_val)(xs)
    accept = (f1s - f0) < c0 * alphas * pg
    # first accepted trial; if none accepted the reference keeps the LAST
    # trial's point but returns alpha after a final halving (0.5^10)
    any_ok = jnp.any(accept)
    idx = jnp.where(any_ok, jnp.argmax(accept), 9)
    alpha = jnp.where(any_ok, alphas[idx], jnp.float32(0.5 ** 10))
    x_new = jax.tree_util.tree_map(lambda a: a[idx], xs)
    return LineSearchResult(alpha=alpha, x_new=x_new, f1=f1s[idx])


def accurate_line_search(f_val: Callable, x: Conf, g, f0, p) -> LineSearchResult:
    """Numerical-Recipes style lnsrch (bfgs.h:107-180).

    Guarantees sufficient decrease or returns alpha=0 (caller zeroes the
    gradient in that case, matching the reference).
    """
    ALF = 1e-4
    slope = jnp.dot(g, p)
    xflat = flatten_conf(x)
    test = jnp.max(jnp.abs(p) / jnp.maximum(jnp.abs(xflat), 1.0))
    alamin = EPSILON_FL / jnp.maximum(test, EPSILON_FL)

    def cond(state):
        it, alpha, alpha2, f2, done, _ = state
        return jnp.logical_and(jnp.logical_not(done), it < 50)

    def body(state):
        it, alpha, alpha2, f2, done, best = state
        x_new = conf_increment(x, p, alpha)
        f1 = f_val(x_new)
        too_small = jnp.logical_or(alpha < alamin, ~jnp.isfinite(alpha))
        sufficient = f1 <= f0 + ALF * alpha * slope
        finish = jnp.logical_or(too_small, sufficient)

        first = it == 0
        tmplam_first = -slope / (2.0 * (f1 - f0 - slope))
        rhs1 = f1 - f0 - alpha * slope
        rhs2 = f2 - f0 - alpha2 * slope
        denom = jnp.where(jnp.abs(alpha - alpha2) < 1e-20, 1e-20, alpha - alpha2)
        a = (rhs1 / (alpha * alpha) - rhs2 / jnp.maximum(alpha2 * alpha2, 1e-20)) / denom
        b = (-alpha2 * rhs1 / (alpha * alpha)
             + alpha * rhs2 / jnp.maximum(alpha2 * alpha2, 1e-20)) / denom
        disc = b * b - 3.0 * a * slope
        tmplam_sub = jnp.where(
            jnp.abs(a) < 1e-20,
            -slope / (2.0 * b),
            jnp.where(disc < 0, 0.5 * alpha,
                      jnp.where(b <= 0, (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) / (3.0 * a),
                                -slope / (b + jnp.sqrt(jnp.maximum(disc, 0.0))))))
        tmplam_sub = jnp.minimum(tmplam_sub, 0.5 * alpha)
        tmplam = jnp.where(first, tmplam_first, tmplam_sub)

        zero_out = too_small
        res = LineSearchResult(
            alpha=jnp.where(zero_out, 0.0, alpha),
            x_new=jax.tree_util.tree_map(
                lambda a0, a1: jnp.where(zero_out, a0, a1), x, x_new),
            f1=jnp.where(zero_out, f0, f1),
        )
        best = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), best, res)
        alpha_next = jnp.maximum(tmplam, 0.1 * alpha)
        return (it + 1, jnp.where(finish, alpha, alpha_next), alpha, f1,
                jnp.logical_or(done, finish), best)

    wrong_dir = slope >= 0
    dummy = LineSearchResult(jnp.float32(0.0), x, f0)
    init = (jnp.int32(0), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0),
            wrong_dir, dummy)
    _, _, _, _, _, best = jax.lax.while_loop(cond, body, init)
    return best


def flatten_conf(c: Conf) -> jnp.ndarray:
    """conf flat view for lambdamin: [pos, rotvec(q), torsions] (conf.h:459)."""
    from gnina_tpu.ops.quat import quaternion_to_rotvec

    return jnp.concatenate([c.position, quaternion_to_rotvec(c.orientation),
                            c.torsions])


class BfgsResult(NamedTuple):
    x: Conf
    f0: jnp.ndarray
    g: jnp.ndarray


def _conf_store(c: Conf) -> jnp.ndarray:
    """Conf -> flat (7+T,) storage row for trajectory capture."""
    return jnp.concatenate([c.position, c.orientation, c.torsions])


def conf_unstore(row, t: int) -> Conf:
    """Inverse of _conf_store."""
    return Conf(position=row[:3], orientation=row[3:7],
                torsions=row[7:7 + t])


def bfgs(f: Callable, x0: Conf, params: MinimizeParams,
         dof_mask=None, f_val: Optional[Callable] = None,
         traj_cap: int = 0):
    """Minimize f over pose DOF starting at x0 (bfgs.h:357-502).

    f: Conf -> (energy, flat gradient (D,)).
    f_val: optional forward-only energy (defaults to f's first output).
    dof_mask: optional (D,) bool of active DOF (padded torsions False).
    traj_cap > 0 (--outputmin, bfgs.h:244-310): additionally record the
    conf at the start of every iteration (and the final conf) into a
    (traj_cap+1, 7+T) history; returns (BfgsResult, hist, n_steps) where
    consecutive hist rows [i, i+1] for i < n_steps are the accepted-step
    endpoints the reference interpolates minout.sdf frames between.
    """
    if f_val is None:
        def f_val(c):
            return f(c)[0]

    if params.type == "simple":
        # --simple_ascent (main.cpp:1189-1191, quasi_newton.cpp:76):
        # legacy adaptive steepest descent instead of BFGS
        from gnina_tpu.ops.ssd import SSDParams, ssd

        r = ssd(f, x0, SSDParams(evals=params.maxiters), dof_mask=dof_mask)
        return BfgsResult(x=r.x, f0=r.f0, g=r.g)

    f0_init, g_init = f(x0)
    d = g_init.shape[-1]
    if dof_mask is not None:
        g_init = jnp.where(dof_mask, g_init, 0.0)
    eye = jnp.eye(d, dtype=jnp.float32)

    line_search = (accurate_line_search if params.type == "accurate"
                   else fast_line_search)
    fused = params.fused_trials and params.type == "fast"

    class State(NamedTuple):
        step: jnp.ndarray
        x: Conf
        g: jnp.ndarray
        h: jnp.ndarray
        f0: jnp.ndarray
        done: jnp.ndarray
        hist: jnp.ndarray       # (traj_cap+1, 7+T) or (0,) when unused

    def cond(s: State):
        return jnp.logical_and(s.step < params.maxiters, ~s.done)

    def body(s: State):
        hist = s.hist
        if traj_cap:
            hist = jax.lax.dynamic_update_slice(
                hist, _conf_store(s.x)[None],
                (jnp.minimum(s.step, traj_cap - 1), jnp.int32(0)))
        p = -(s.h @ s.g)
        if dof_mask is not None:
            p = jnp.where(dof_mask, p, 0.0)
        if fused:
            # one batched value-and-grad over all 10 Armijo trials
            # (bfgs.h:73-91 evaluates gradient at every trial too)
            c0 = 1e-4
            pg = jnp.dot(p, s.g)
            alphas = 0.5 ** jnp.arange(10, dtype=jnp.float32)
            xs = jax.vmap(lambda a: conf_increment(s.x, p, a))(alphas)
            f1s, gs = jax.vmap(f)(xs)
            acc = (f1s - s.f0) < c0 * alphas * pg
            any_ok = jnp.any(acc)
            idx = jnp.where(any_ok, jnp.argmax(acc), 9)
            alpha = jnp.where(any_ok, alphas[idx], jnp.float32(0.5 ** 10))
            ls = LineSearchResult(
                alpha=alpha,
                x_new=jax.tree_util.tree_map(lambda a: a[idx], xs),
                f1=f1s[idx])
            g_new = gs[idx]
            wrong_dir = jnp.asarray(False)
        else:
            ls = line_search(f_val, s.x, s.g, s.f0, p)
            alpha = ls.alpha
            wrong_dir = alpha == 0.0
            # gradient at the accepted point (forward trials skipped it)
            _f1g, g_new = f(ls.x_new)
        if dof_mask is not None:
            g_new = jnp.where(dof_mask, g_new, 0.0)
        g_new = jnp.where(wrong_dir, jnp.zeros_like(g_new), g_new)
        y = g_new - s.g

        f0_new = jnp.where(wrong_dir, s.f0, ls.f1)
        x_new = jax.tree_util.tree_map(
            lambda old, new: jnp.where(wrong_dir, old, new), s.x, ls.x_new)
        g_next = jnp.where(wrong_dir, s.g, g_new)
        gradnormsq = jnp.dot(g_next, g_next)
        small_grad = gradnormsq < 1e-4
        if params.early_term:
            small_grad = jnp.logical_or(small_grad,
                                        jnp.abs(s.f0 - f0_new) < 1e-5)
        done = jnp.logical_or(wrong_dir, small_grad)

        # Hessian scaling on first step (bfgs.h:481-486)
        yy = jnp.dot(y, y)
        scale = jnp.where(jnp.abs(yy) > EPSILON_FL,
                          alpha * jnp.dot(y, p) / jnp.maximum(yy, EPSILON_FL), 1.0)
        h = jnp.where(s.step == 0, eye * scale, s.h)

        # bfgs_update (bfgs.h:52-66)
        yp = jnp.dot(y, p)
        ok = alpha * yp >= EPSILON_FL
        minus_hy = -(h @ y)
        yhy = -jnp.dot(y, minus_hy)
        r = 1.0 / jnp.maximum(alpha * yp, EPSILON_FL)
        outer = (alpha * r) * (minus_hy[:, None] * p[None, :]
                               + p[:, None] * minus_hy[None, :])
        outer = outer + (alpha * alpha * (r * r * yhy + r)) * (p[:, None] * p[None, :])
        h_new = jnp.where(jnp.logical_and(ok, ~done), h + outer, h)

        return State(step=s.step + 1, x=x_new, g=g_next, h=h_new,
                     f0=f0_new, done=done, hist=hist)

    row = 7 + x0.torsions.shape[-1]
    hist0 = (jnp.zeros((traj_cap + 1, row), jnp.float32) if traj_cap
             else jnp.zeros((0,), jnp.float32))
    init = State(step=jnp.int32(0), x=x0, g=g_init, h=eye,
                 f0=f0_init, done=jnp.asarray(False), hist=hist0)
    final = jax.lax.while_loop(cond, body, init)

    # restore original if not improved (succeeds for NaN too) — bfgs.h:491
    improved = final.f0 <= f0_init
    x_out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(improved, new, old), final.x, x0)
    f_out = jnp.where(improved, final.f0, f0_init)
    g_out = jnp.where(improved, final.g, g_init)
    res = BfgsResult(x=x_out, f0=f_out, g=g_out)
    if traj_cap:
        n = jnp.minimum(final.step, traj_cap)
        hist = jax.lax.dynamic_update_slice(
            final.hist, _conf_store(final.x)[None], (n, jnp.int32(0)))
        return res, hist, n
    return res
