"""Device-resident Monte Carlo pose search with top-N dedup container.

TPU-native replacement for monte_carlo.cpp + parallel_mc.cpp: one MC chain
is a `lax.scan` over steps; the reference's `exhaustiveness` thread pool
becomes a vmapped batch of chains merged on-device.  The saved-minima
container (coords.cpp add_to_output_container) becomes a fixed-slot buffer
updated with masked scatter ops.

Semantics mirrored from the reference:
- mutate_conf picks ONE random DOF: +-2A translation, gyration-scaled
  rotation, or torsion redraw (mutate.cpp:35-73)
- truncated BFGS under hunt_cap, metropolis at T=1.2 on the INTER-only
  energy at authentic v (monte_carlo.cpp:44-47,99-148), full-v refinement
  of improved poses
- RMSD-deduplicated top-N insert (coords.cpp:43-56)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gnina_tpu.constants import EPSILON_FL, MAX_FL
from gnina_tpu.ops import fk
from gnina_tpu.ops.bfgs import MinimizeParams, bfgs
from gnina_tpu.ops.quat import quaternion_increment, random_orientation
from gnina_tpu.types import Conf, LigandData


@dataclasses.dataclass(frozen=True)
class MCParams:
    num_steps: int = 1000
    temperature: float = 1.2
    mutation_amplitude: float = 2.0
    min_rmsd: float = 1.0
    num_saved_mins: int = 50
    hunt_cap: tuple = (10.0, 10.0, 10.0)
    minparams: MinimizeParams = MinimizeParams()
    # Full-v refinement cadence.  The reference refines only "promising"
    # steps (improved best / container not full, monte_carlo.cpp:120-135);
    # per-lane gating is impossible in SIMT, so instead the latest promising
    # pose of each lane is refined once every `refine_stride` steps (1 =
    # every step = reference cadence paid on every lane; 0 = never, rely on
    # the final refine_structure stages).  Promising poses are additionally
    # inserted unrefined right away, so nothing is lost between boundaries.
    refine_stride: int = 4


class PoseContainer(NamedTuple):
    """Fixed-slot saved-minima buffer (per chain or merged)."""

    energy: jnp.ndarray    # (S,)
    position: jnp.ndarray  # (S,3)
    orientation: jnp.ndarray  # (S,4)
    torsions: jnp.ndarray  # (S,T)
    coords: jnp.ndarray    # (S,N,3) heavy-atom lab coords (hydrogens zeroed)


def empty_container(s: int, t: int, n: int) -> PoseContainer:
    return PoseContainer(
        energy=jnp.full((s,), MAX_FL, jnp.float32),
        position=jnp.zeros((s, 3), jnp.float32),
        orientation=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (s, 1)),
        torsions=jnp.zeros((s, t), jnp.float32),
        coords=jnp.full((s, n, 3), 1e9, jnp.float32),
    )


def rmsd_upper_bound_sq(coords_a, coords_b, heavy_mask):
    """Mean squared same-index heavy-atom distance (model.cpp:1064-1078)."""
    d2 = jnp.sum((coords_a - coords_b) ** 2, axis=-1)  # (...,N)
    cnt = jnp.maximum(jnp.sum(heavy_mask, axis=-1), 1)
    return jnp.sum(jnp.where(heavy_mask, d2, 0.0), axis=-1) / cnt


def add_to_container(cont: PoseContainer, conf: Conf, energy, coords,
                     heavy_mask, min_rmsd: float) -> PoseContainer:
    """add_to_output_container (coords.cpp:43-56) with fixed slots."""
    r2 = rmsd_upper_bound_sq(cont.coords, coords[None, :, :], heavy_mask[None, :])
    closest = jnp.argmin(r2)
    have_close = r2[closest] < min_rmsd * min_rmsd
    worst = jnp.argmax(cont.energy)

    # case 1: similar pose exists -> replace if better
    replace_similar = jnp.logical_and(have_close, energy < cont.energy[closest])
    # case 2: nothing similar -> take worst slot if better (empty slots have
    # energy = MAX_FL so they are always taken first)
    replace_worst = jnp.logical_and(~have_close, energy < cont.energy[worst])

    slot = jnp.where(replace_similar, closest, worst)
    do = jnp.logical_or(replace_similar, replace_worst)

    def upd(arr, new):
        return jnp.where(do, arr.at[slot].set(new), arr)

    return PoseContainer(
        energy=upd(cont.energy, energy),
        position=upd(cont.position, conf.position),
        orientation=upd(cont.orientation, conf.orientation),
        torsions=upd(cont.torsions, conf.torsions),
        coords=upd(cont.coords, jnp.where(heavy_mask[:, None], coords, 1e9)),
    )


def batch_merge_candidates(cont: PoseContainer, cand: PoseContainer,
                           heavy_mask, min_rmsd: float,
                           greedy_iters: int = 16) -> PoseContainer:
    """Fold S candidate poses into the K-slot container in ONE pass.

    Device-native replacement for S sequential `add_to_container` calls
    (coords.cpp add_to_output_container): the sequential chain of tiny
    dedup updates was the dominant host-side cost of the in-kernel MC path
    (each add depends on the previous).  Here: concatenate the K existing
    slots with the S candidates, sort by energy, suppress every entry
    within min_rmsd of a better KEPT entry, and keep the best K survivors.

    The kept-set recurrence (greedy dedup in energy order) is computed by
    fixed-point iteration of `kept[i] = !any_j(adj[i,j] & kept[j])` — an
    antitone map whose unique fixed point is the greedy solution; after t
    iterations every entry whose suppression-chain depth is < t is exact.
    greedy_iters=16 covers any realistic pose cluster chain.

    Invalid entries (energy >= MAX_FL) never suppress and sort last;
    unkept/invalid output slots are reset to the empty-slot convention
    (energy MAX_FL, coords 1e9) so later merges see them as empty.
    """
    k = cont.energy.shape[0]
    allc = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), cont, cand)
    order = jnp.argsort(allc.energy)
    allc = jax.tree_util.tree_map(lambda a: a[order], allc)
    e = allc.energy
    mtot = e.shape[0]

    # pairwise heavy-atom rmsd^2 via the Gram expansion (one MXU matmul
    # instead of an (M,M,N,3) broadcast): non-heavy atoms zeroed out
    x = jnp.where(heavy_mask[None, :, None], allc.coords, 0.0)
    xf = x.reshape(mtot, -1)
    sq = jnp.sum(xf * xf, axis=-1)
    gram = xf @ xf.T
    cnt = jnp.maximum(jnp.sum(heavy_mask), 1)
    d2 = (sq[:, None] + sq[None, :] - 2.0 * gram) / cnt

    valid = e < MAX_FL
    ii = jnp.arange(mtot)
    adj = ((ii[None, :] < ii[:, None])            # j strictly better-ranked
           & (d2 < min_rmsd * min_rmsd)
           & valid[None, :]).astype(jnp.float32)  # adj[i, j]: j suppresses i

    def _iter(_, kept):
        return (adj @ kept < 0.5).astype(jnp.float32)

    kept = jax.lax.fori_loop(0, greedy_iters, _iter,
                             jnp.ones((mtot,), jnp.float32))
    keep = (kept > 0.5) & valid

    sel = jnp.argsort(~keep, stable=True)[:k]     # kept first, energy order
    out = jax.tree_util.tree_map(lambda a: a[sel], allc)
    kvalid = keep[sel]
    return out._replace(
        energy=jnp.where(kvalid, out.energy, MAX_FL),
        coords=jnp.where(kvalid[:, None, None], out.coords, 1e9))


def random_inside_sphere(key):
    """Uniform point in the unit ball (direction x cbrt(U))."""
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (3,), jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), EPSILON_FL)
    r = jax.random.uniform(k2, (), jnp.float32) ** (1.0 / 3.0)
    return r * d


def gyration_radius(coords, root_pos, lig_heavy_mask):
    """Ligand heavy-atom gyration radius about the root origin
    (model.cpp:1002)."""
    d2 = jnp.sum((coords - root_pos) ** 2, axis=-1)
    cnt = jnp.maximum(jnp.sum(lig_heavy_mask), 1)
    return jnp.sqrt(jnp.sum(jnp.where(lig_heavy_mask, d2, 0.0)) / cnt)


def mutate_conf(key, conf: Conf, gr, amplitude: float,
                num_real_torsions, has_rigid_dof=True) -> Conf:
    """One-DOF mutation (mutate.cpp:35-73).

    gr: current ligand gyration radius (computed by the caller from the
    carried coords — saves an FK pass per MC step).
    has_rigid_dof False (covalent complexes) restricts the draw to
    torsions, matching a reference model with an empty `ligands` list."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t = conf.torsions.shape[-1]
    lo = jnp.where(jnp.asarray(has_rigid_dof), 0, 2)
    which = jax.random.randint(k1, (), lo, num_real_torsions + 2)

    # position mutation
    pos_new = conf.position + amplitude * random_inside_sphere(k2)

    # orientation mutation, scaled by current LIGAND gyration radius
    # (model.cpp:1002 uses ligand heavy atoms about the ligand root origin)
    rot = (amplitude / jnp.maximum(gr, EPSILON_FL)) * random_inside_sphere(k3)
    quat_new = jnp.where(gr > EPSILON_FL,
                         quaternion_increment(conf.orientation, rot),
                         conf.orientation)

    # torsion redraw
    tor_idx = which - 2
    new_tor = jax.random.uniform(k4, (), jnp.float32, -jnp.pi, jnp.pi)
    tors_new = jnp.where(jnp.arange(t) == tor_idx, new_tor, conf.torsions)

    return Conf(
        position=jnp.where(which == 0, pos_new, conf.position),
        orientation=jnp.where(which == 1, quat_new, conf.orientation),
        torsions=jnp.where(which >= 2, tors_new, conf.torsions),
    )


def randomize_conf(key, lig: LigandData, corner1, corner2, t: int) -> Conf:
    """Random position in box, random orientation, random torsions
    (conf.h:119-122,441-446)."""
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.uniform(k1, (3,), jnp.float32) * (corner2 - corner1) + corner1
    quat = random_orientation(k2)
    tors = jax.random.uniform(k3, (t,), jnp.float32, -jnp.pi, jnp.pi)
    return Conf(position=pos, orientation=quat, torsions=tors)


def metropolis_accept(key, old_f, new_f, temperature):
    accept_p = jnp.exp((old_f - new_f) / temperature)
    return jnp.logical_or(new_f < old_f,
                          jax.random.uniform(key, (), jnp.float32) < accept_p)


class MCCarry(NamedTuple):
    """Resumable MC chain state: carrying it across program invocations
    chunks the search (bounded program run times, preemption recovery).

    coords mirror conf (saves FK passes); pending_* track the latest
    promising pose awaiting its full-v refinement at the next stride
    boundary (see MCParams.refine_stride)."""

    conf: Conf
    e: jnp.ndarray
    best_e: jnp.ndarray
    cont: PoseContainer
    coords: jnp.ndarray            # (N,3) lab coords of conf
    pending: Conf                  # latest promising pose since last refine
    pending_valid: jnp.ndarray     # bool
    pending_is_current: jnp.ndarray  # bool: pending == conf (chain head)


def mc_init(key, lig: LigandData, params: MCParams, corner1, corner2,
            max_layers: int) -> MCCarry:
    t = lig.num_torsion_slots
    n = lig.types.shape[0]
    conf0 = randomize_conf(key, lig, corner1, corner2, t)
    coords0 = fk.fk_coords(lig, conf0, max_layers)
    return MCCarry(conf=conf0, e=jnp.float32(MAX_FL),
                   best_e=jnp.float32(MAX_FL),
                   cont=empty_container(params.num_saved_mins, t, n),
                   coords=coords0, pending=conf0,
                   pending_valid=jnp.asarray(False),
                   pending_is_current=jnp.asarray(False))


def mc_chunk(carry: MCCarry, key, num_steps: int, lig: LigandData, energy_fn,
             params: MCParams, max_layers: int, dof_mask,
             num_real_torsions, has_rigid_dof=True) -> MCCarry:
    """Run num_steps MC steps from a carried state (monte_carlo.cpp:99-148).

    energy_fn contract:
      eval_deriv(conf, v) -> (e, g) for BFGS;
      metro_on_coords(coords) -> metropolis/update energy at authentic v
        (the reference's ig_metropolis->eval: the search grid's inter-only
        energy for standard docking, parallel_mc.cpp:161-162);
      eval_energy(conf, v) -> forward-only energy (line-search trials,
        unused when the BFGS runs fused value-and-grad trials).
    """
    eval_deriv = energy_fn["eval_deriv"]
    metro_on_coords = energy_fn["metro_on_coords"]
    eval_energy = energy_fn.get("eval_energy")

    hunt_cap = jnp.asarray(params.hunt_cap, jnp.float32)
    authentic_v = jnp.array([1000.0, 1000.0, 1000.0], jnp.float32)

    def f_hunt(conf):
        return eval_deriv(conf, hunt_cap)

    def f_full(conf):
        return eval_deriv(conf, authentic_v)

    fv_hunt = (lambda c: eval_energy(c, hunt_cap)) if eval_energy else None
    fv_full = (lambda c: eval_energy(c, authentic_v)) if eval_energy else None

    Carry = MCCarry

    def step(carry: Carry, k):
        k1, k2 = jax.random.split(k)
        gr = gyration_radius(carry.coords, carry.conf.position,
                             lig.lig_heavy_mask)
        cand = mutate_conf(k1, carry.conf, gr, params.mutation_amplitude,
                           num_real_torsions, has_rigid_dof)
        res = bfgs(f_hunt, cand, params.minparams, dof_mask, f_val=fv_hunt)
        cand = res.x
        cand_coords = fk.fk_coords(lig, cand, max_layers)
        cand_e = metro_on_coords(cand_coords)

        accept = metropolis_accept(k2, carry.e, cand_e, params.temperature)
        first = carry.e >= MAX_FL  # step 0 always accepts
        accept = jnp.logical_or(accept, first)

        new_conf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, carry.conf)
        new_e = jnp.where(accept, cand_e, carry.e)
        new_coords = jnp.where(accept, cand_coords, carry.coords)

        # "promising" gate (monte_carlo.cpp:120-135): improved best OR
        # container not yet full.  The pose is saved unrefined right away;
        # its full-v refinement happens at the next stride boundary.
        has_empty = jnp.any(carry.cont.energy >= MAX_FL)
        promising = jnp.logical_and(
            accept, jnp.logical_or(cand_e < carry.best_e, has_empty))

        cont = jax.tree_util.tree_map(
            lambda a, b: jnp.where(promising, a, b),
            add_to_container(carry.cont, new_conf, new_e, new_coords,
                             lig.heavy_mask, params.min_rmsd),
            carry.cont)
        best_e = jnp.where(jnp.logical_and(promising, new_e < carry.best_e),
                           new_e, carry.best_e)

        pending = jax.tree_util.tree_map(
            lambda a, b: jnp.where(promising, a, b), new_conf, carry.pending)
        pending_valid = jnp.logical_or(carry.pending_valid, promising)
        pending_is_current = jnp.where(
            promising, True,
            jnp.logical_and(carry.pending_is_current, ~accept))

        return Carry(conf=new_conf, e=new_e, best_e=best_e, cont=cont,
                     coords=new_coords, pending=pending,
                     pending_valid=pending_valid,
                     pending_is_current=pending_is_current), None

    def refine_phase(carry: Carry) -> Carry:
        """Full-v refinement of the pending promising pose (the reference's
        in-loop `quasi_newton_par(..., authentic_v)`, monte_carlo.cpp:128).
        When the pending pose is still the chain head, the chain continues
        from the refined conf exactly like the reference."""
        res = bfgs(f_full, carry.pending, params.minparams, dof_mask,
                   f_val=fv_full)
        rcoords = fk.fk_coords(lig, res.x, max_layers)
        re = metro_on_coords(rcoords)
        do = carry.pending_valid
        cont = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do, a, b),
            add_to_container(carry.cont, res.x, re, rcoords,
                             lig.heavy_mask, params.min_rmsd),
            carry.cont)
        best_e = jnp.where(jnp.logical_and(do, re < carry.best_e), re,
                           carry.best_e)
        move = jnp.logical_and(do, carry.pending_is_current)
        conf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(move, a, b), res.x, carry.conf)
        e = jnp.where(move, re, carry.e)
        coords = jnp.where(move, rcoords, carry.coords)
        return Carry(conf=conf, e=e, best_e=best_e, cont=cont, coords=coords,
                     pending=carry.pending,
                     pending_valid=jnp.asarray(False),
                     pending_is_current=jnp.asarray(False))

    stride = params.refine_stride
    keys = jax.random.split(key, num_steps)
    if stride and stride > 0 and num_steps >= stride:
        # flat scan with a strided cond (NOT a nested scan-of-scans: that
        # shape crashes the TPU compiler); the cond predicate is uniform
        # across vmapped lanes so only one branch executes per step
        idx = jnp.arange(num_steps, dtype=jnp.int32)

        def step_maybe_refine(carry, xs):
            k, i = xs
            carry, _ = step(carry, k)
            do_refine = (i % stride) == (stride - 1)
            carry = jax.lax.cond(do_refine, refine_phase, lambda c: c, carry)
            return carry, None

        final, _ = jax.lax.scan(step_maybe_refine, carry, (keys, idx))
    else:
        final, _ = jax.lax.scan(step, carry, keys)
    return final


def run_mc_chain(key, lig: LigandData, energy_fn, params: MCParams,
                 corner1, corner2, max_layers: int, dof_mask,
                 num_real_torsions) -> PoseContainer:
    """Full MC chain in one program (init + all steps); prefer the chunked
    mc_init/mc_chunk pair for long runs."""
    k_init, k_loop = jax.random.split(key)
    carry = mc_init(k_init, lig, params, corner1, corner2, max_layers)
    final = mc_chunk(carry, k_loop, params.num_steps, lig, energy_fn,
                     params, max_layers, dof_mask, num_real_torsions)
    return final.cont


def merge_containers(conts: PoseContainer, heavy_mask, min_rmsd: float,
                     out_slots: int) -> PoseContainer:
    """Merge per-chain containers (parallel_mc.cpp:168-181, min_rmsd=2).

    conts has a leading chain axis; returns a single container with
    out_slots entries, deduplicated and sorted by energy.
    """
    c = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), conts)
    order = jnp.argsort(c.energy)
    c = jax.tree_util.tree_map(lambda a: a[order], c)

    total = c.energy.shape[0]
    t = c.torsions.shape[-1]
    n = c.coords.shape[-2]
    out = empty_container(out_slots, t, n)

    def body(i, out):
        conf = Conf(position=c.position[i], orientation=c.orientation[i],
                    torsions=c.torsions[i])
        valid = c.energy[i] < MAX_FL
        new = add_to_container(out, conf, c.energy[i], c.coords[i],
                               heavy_mask, min_rmsd)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(valid, a, b), new, out)

    out = jax.lax.fori_loop(0, total, body, out)
    order = jnp.argsort(out.energy)
    return jax.tree_util.tree_map(lambda a: a[order], out)
