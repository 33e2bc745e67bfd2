"""Monte Carlo chunk driven by the fused Pallas BFGS kernel.

The XLA MC path (ops/mc.py) vmaps a per-chain `lax.scan`, so every MC
step decomposes into hundreds of small XLA ops whose fixed cost dominates
on TPU.  Here the step loop runs ONCE at top level over a packed
(quantity, lane) layout and the whole per-step minimization — FK, exact
pair energies, analytic gradients, Armijo line search, Hessian updates —
executes inside a single Mosaic kernel (ops/pallas_dock.py), the TPU
analogue of the reference's one-kernel GPU minimizer (bfgs.cu:230-345).

Semantics mirror ops/mc.py step for step (mutate_conf / metropolis /
container bookkeeping reuse the same functions vmapped over the flat lane
axis), so the two paths are interchangeable; docking.py picks this one
when the scoring function is in the fused family and the complex is
ligand-only (monte_carlo.cpp:99-148 is the behavioral reference).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.constants import MAX_FL
from gnina_tpu.ops import mc
from gnina_tpu.ops import pallas_dock as pd
from gnina_tpu.types import Conf


class LaneMeta(NamedTuple):
    """Per-lane static metadata for the flattened (ligand x chain) axis."""

    ntors: jnp.ndarray        # (L,) int32 real torsion count
    has_rigid: jnp.ndarray    # (L,) bool
    heavy_idx: jnp.ndarray    # (L, NH) int32 heavy-subset -> full index, -1 pad
    heavy_mask: jnp.ndarray   # (L, N) bool full-atom heavy mask


def lane_meta(ligs, exhaustiveness: int, pack: pd.DockPack,
              n_full: int) -> LaneMeta:
    from gnina_tpu.constants import IS_HYDROGEN

    ntors, rigid, hidx, hmask = [], [], [], []
    nh = pack.heavy_idx.shape[1]
    for gi, lig in enumerate(ligs):
        hm = np.zeros(n_full, bool)
        hm[:lig.num_atoms] = ~IS_HYDROGEN[lig.types]
        for _ in range(exhaustiveness):
            ntors.append(lig.num_torsions)
            rigid.append(lig.has_rigid_dof)
            hidx.append(pack.heavy_idx[gi])
            hmask.append(hm)
    return LaneMeta(ntors=jnp.asarray(ntors, jnp.int32),
                    has_rigid=jnp.asarray(rigid),
                    heavy_idx=jnp.asarray(np.stack(hidx), jnp.int32),
                    heavy_mask=jnp.asarray(np.stack(hmask)))


def _flatten_carry(carry: mc.MCCarry) -> mc.MCCarry:
    """(Lg, E, ...) -> (Lg*E, ...)."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), carry)


def _unflatten_carry(carry: mc.MCCarry, lg: int, e: int) -> mc.MCCarry:
    return jax.tree_util.tree_map(
        lambda a: a.reshape((lg, e) + a.shape[1:]), carry)


def _scatter_full(coords_h, hidx, n_full: int):
    """Heavy-subset (NH,3) coords -> full-atom (N,3); hydrogens stay 0."""
    full = jnp.zeros((n_full, 3), jnp.float32)
    safe = jnp.where(hidx >= 0, hidx, n_full)  # out-of-range -> dropped
    return full.at[safe].set(coords_h, mode="drop")


def fused_mc_chunk(carry: mc.MCCarry, key, num_steps: int,
                   fused: pd.FusedBfgs, pack: pd.DockPack, scal_hunt,
                   scal_full, meta: LaneMeta, params: mc.MCParams, tp: int,
                   lane_offset=0):
    """Run num_steps MC steps on the flat lane axis (monte_carlo.cpp:99-148).

    carry: MCCarry with flat leading lane axis (L,).
    fused: hunt-cap + full-v minimizations share one compiled kernel; the
      v levels ride in the scal operand (scal_hunt / scal_full).
    pack: traced DockPack arrays (passed through jit so ligand batches
      sharing one shape bucket reuse the compiled program).
    tp: torsion slot count of the Conf pytrees.
    lane_offset: global index of this shard's first lane (shard_map use);
      keeps per-lane RNG streams identical to the unsharded program.
    """
    lanes = carry.e.shape[0]
    l_pad = pack.lc.shape[-1]
    m = fused.m
    n_full = carry.coords.shape[-2]

    def pack_conf(conf):
        rigid, tors = pd.conf_to_packed(conf, m)
        if l_pad > lanes:
            rigid = jnp.pad(rigid, ((0, 0), (0, l_pad - lanes)))
            tors = jnp.pad(tors, ((0, 0), (0, l_pad - lanes)))
        return rigid, tors

    def unpack_conf(rigid, tors):
        return pd.packed_to_conf(rigid[:, :lanes], tors[:, :lanes], tp)

    def minimize(conf, scal):
        """One fused kernel call: returns (conf', metro_e, full_coords)."""
        rigid, tors = pack_conf(conf)
        org, otr, stats, coords_h = fused(rigid, tors, scal, pack=pack)
        conf2 = unpack_conf(org, otr)
        metro_e = stats[1, :lanes]
        ch = jnp.transpose(coords_h[..., :lanes], (2, 1, 0))  # (L, NH, 3)
        full = jax.vmap(_scatter_full, in_axes=(0, 0, None))(
            ch, meta.heavy_idx, n_full)
        return conf2, metro_e, full

    v_add = jax.vmap(mc.add_to_container, in_axes=(0, 0, 0, 0, 0, None))

    def step(carry: mc.MCCarry, xs):
        k, i = xs
        k1, k2 = jax.random.split(k)
        kmut = jax.vmap(lambda j: jax.random.fold_in(k1, j))(
            lane_offset + jnp.arange(lanes))
        kmet = jax.vmap(lambda j: jax.random.fold_in(k2, j))(
            lane_offset + jnp.arange(lanes))

        gr = jax.vmap(mc.gyration_radius)(
            carry.coords, carry.conf.position, meta.heavy_mask)
        cand = jax.vmap(mc.mutate_conf,
                        in_axes=(0, 0, 0, None, 0, 0))(
            kmut, carry.conf, gr, params.mutation_amplitude,
            meta.ntors, meta.has_rigid)

        cand, cand_e, cand_coords = minimize(cand, scal_hunt)

        accept = jax.vmap(mc.metropolis_accept, in_axes=(0, 0, 0, None))(
            kmet, carry.e, cand_e, params.temperature)
        accept = jnp.logical_or(accept, carry.e >= MAX_FL)

        def sel(a, b):
            acc = accept.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(acc, a, b)

        new_conf = jax.tree_util.tree_map(sel, cand, carry.conf)
        new_e = jnp.where(accept, cand_e, carry.e)
        new_coords = sel(cand_coords, carry.coords)

        has_empty = jnp.any(carry.cont.energy >= MAX_FL, axis=-1)
        promising = jnp.logical_and(
            accept, jnp.logical_or(cand_e < carry.best_e, has_empty))

        cont_new = v_add(carry.cont, new_conf, new_e, new_coords,
                         meta.heavy_mask, params.min_rmsd)

        def psel(a, b):
            p = promising.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(p, a, b)

        cont = jax.tree_util.tree_map(psel, cont_new, carry.cont)
        best_e = jnp.where(jnp.logical_and(promising, new_e < carry.best_e),
                           new_e, carry.best_e)
        pending = jax.tree_util.tree_map(psel, new_conf, carry.pending)
        pending_valid = jnp.logical_or(carry.pending_valid, promising)
        pending_is_current = jnp.where(
            promising, True,
            jnp.logical_and(carry.pending_is_current, ~accept))

        return mc.MCCarry(conf=new_conf, e=new_e, best_e=best_e, cont=cont,
                          coords=new_coords, pending=pending,
                          pending_valid=pending_valid,
                          pending_is_current=pending_is_current), None

    def refine_phase(carry: mc.MCCarry) -> mc.MCCarry:
        """Full-v refinement of pending promising poses (the in-loop
        quasi_newton at authentic_v, monte_carlo.cpp:128)."""
        rconf, re, rcoords = minimize(carry.pending, scal_full)
        do = carry.pending_valid

        cont_new = v_add(carry.cont, rconf, re, rcoords,
                         meta.heavy_mask, params.min_rmsd)

        def dsel(a, b):
            d = do.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(d, a, b)

        cont = jax.tree_util.tree_map(dsel, cont_new, carry.cont)
        best_e = jnp.where(jnp.logical_and(do, re < carry.best_e), re,
                           carry.best_e)
        move = jnp.logical_and(do, carry.pending_is_current)

        def msel(a, b):
            mm = move.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mm, a, b)

        conf = jax.tree_util.tree_map(msel, rconf, carry.conf)
        e = jnp.where(move, re, carry.e)
        coords = msel(rcoords, carry.coords)
        return mc.MCCarry(conf=conf, e=e, best_e=best_e, cont=cont,
                          coords=coords, pending=carry.pending,
                          pending_valid=jnp.zeros_like(carry.pending_valid),
                          pending_is_current=jnp.zeros_like(
                              carry.pending_is_current))

    stride = params.refine_stride
    keys = jax.random.split(key, num_steps)
    idx = jnp.arange(num_steps, dtype=jnp.int32)

    if stride and stride > 0 and num_steps >= stride:
        def step_maybe_refine(carry, xs):
            k, i = xs
            carry, _ = step(carry, (k, i))
            do_refine = (i % stride) == (stride - 1)
            carry = jax.lax.cond(do_refine, refine_phase, lambda c: c, carry)
            return carry, None

        final, _ = jax.lax.scan(step_maybe_refine, carry, (keys, idx))
    else:
        final, _ = jax.lax.scan(step, carry, (keys, idx))
    return final


def fused_mc_chunk_inkernel(carry: mc.MCCarry, key, num_steps: int,
                            fused_mc: pd.FusedBfgs, fused_ref: pd.FusedBfgs,
                            pack: pd.DockPack, scal_hunt, scal_full,
                            meta: LaneMeta, params: mc.MCParams, tp: int,
                            seed_offset=0, refine_subs: int = 1):
    """MC chunk with the WHOLE step loop in-kernel (mutate + BFGS +
    metropolis via the TPU PRNG, ops/pallas_dock.py mc_steps mode).

    The kernel runs S = fused_mc.mc_steps steps per invocation, carries
    the accept chain itself (its final rigid/tors/e ARE the chain state),
    and streams each step's minimized candidate back.  The host-side
    bookkeeping per S steps is then just:
      1. pick the best accepted candidate of each of the `refine_subs`
         sub-windows (S/refine_subs steps each) and refine it at full v
         through the plain kernel (the reference's in-loop promising-pose
         refinement, monte_carlo.cpp:120-135).  Decoupling the refine
         CADENCE from the window LENGTH matters: the pooled tick budget
         wants long windows (sampling efficiency) while pose geometry
         wants full-v refined poses admitted to the container every ~32
         steps — the r5 geometry gate measured 184l rmsd<2A 16/24 at a
         32-step cadence vs 8/24 at 64 while shortening the WINDOW to 32
         cost 0.35 kcal/mol mean best on 10gs (ROADMAP r5);
      2. fold ALL accepted candidates + the refined poses into the top-N
         container with ONE batched sort/dedup merge
         (mc.batch_merge_candidates) — the round-2 sequential
         add_to_container chain was the dominant per-step host cost.
    """
    lanes = carry.e.shape[0]
    l_pad = pack.lc.shape[-1]
    m = fused_mc.m
    s_steps = fused_mc.mc_steps
    n_full = carry.coords.shape[-2]
    assert num_steps % s_steps == 0, \
        "chunk steps must be a multiple of fused mc_steps (driver rounds)"
    assert refine_subs >= 1 and s_steps % refine_subs == 0, \
        "refine_subs must divide the window length (driver rounds)"
    n_outer = num_steps // s_steps

    def pack_conf(conf):
        rigid, tors = pd.conf_to_packed(conf, m)
        if l_pad > lanes:
            rigid = jnp.pad(rigid, ((0, 0), (0, l_pad - lanes)))
            tors = jnp.pad(tors, ((0, 0), (0, l_pad - lanes)))
        return rigid, tors

    def scatter_batch(ch):
        """(3, N, lanes) heavy coords -> (lanes, n_full, 3)."""
        c = jnp.transpose(ch[..., :lanes], (2, 1, 0))
        return jax.vmap(_scatter_full, in_axes=(0, 0, None))(
            c, meta.heavy_idx, n_full)

    v_merge = jax.vmap(mc.batch_merge_candidates,
                       in_axes=(0, 0, 0, None))
    big = jnp.float32(3e38)

    def outer(carry: mc.MCCarry, k):
        # seed_offset: this shard's first global kernel-block index
        # (shard_map use); the kernel adds its local program_id so every
        # lane block draws the same stream as in the unsharded program
        seed = jax.random.randint(k, (), 0, 1 << 30) + seed_offset
        rigid, tors = pack_conf(carry.conf)
        ecur = carry.e[None, :]
        if l_pad > lanes:
            ecur = jnp.pad(ecur, ((0, 0), (0, l_pad - lanes)))
        if fused_mc.async_mc:
            # completion-indexed stream (component-major (C*S, L) slabs):
            # the kernel lands a lane's j-th completed step at row j via a
            # one-hot accumulate, so the host reads step order directly —
            # no tick compression.  Rows a budget-exhausted lane never
            # completed are zero (flag 0).  Coordinates are rebuilt with
            # the XLA twin of the kernel FK (the stream carries conf only).
            (frigid, ftors, fstats, fcoords, srig, stor,
             sstat) = fused_mc.run_mc(rigid, tors, scal_hunt, seed, ecur,
                                      pack=pack)
            crig_p = jnp.transpose(srig.reshape(8, s_steps, l_pad),
                                   (1, 0, 2))             # (S, 8, l_pad)
            ctor_p = jnp.transpose(stor.reshape(m, s_steps, l_pad),
                                   (1, 0, 2))             # (S, M, l_pad)
            stat_p = jnp.transpose(sstat.reshape(3, s_steps, l_pad),
                                   (1, 0, 2))             # (S, 3, l_pad)
            validp = stat_p[:, 2, :] > 0.5                # (S, l_pad)
            # never-completed rows are zeros (quat 0): neutralize before
            # FK so degenerate quaternions cannot poison downstream math
            ident = jnp.asarray([0, 0, 0, 1, 0, 0, 0, 0],
                                jnp.float32).reshape(1, 8, 1)
            safe = validp[:, None, :]
            crig_p = jnp.where(safe, crig_p, ident)
            ccrd_p = jax.vmap(lambda r, t: pd.fk_packed(r, t, pack))(
                crig_p, ctor_p)                           # (S, 3, N, l_pad)
            validS = validp[..., :lanes]                  # (S, L)
            crig = crig_p[..., :lanes]
            ctor = ctor_p[..., :lanes]
            ccrd = ccrd_p[..., :lanes]
            cand_e = jnp.where(validS, stat_p[:, 0, :lanes], MAX_FL).T
            accept = jnp.logical_and(stat_p[:, 1, :lanes] > 0.5,
                                     validS).T            # (L, S)
        else:
            (frigid, ftors, fstats, fcoords, srig, stor,
             sstat) = fused_mc.run_mc(rigid, tors, scal_hunt, seed, ecur,
                                      pack=pack)

            # candidate stream: (S, rows, L) slabs -> lane-major pytrees;
            # coordinates rebuilt host-side (the kernel streams conf only)
            crig_p = srig.reshape(s_steps, 8, l_pad)
            ctor_p = stor.reshape(s_steps, m, l_pad)
            ccrd_p = jax.vmap(lambda r, t: pd.fk_packed(r, t, pack))(
                crig_p, ctor_p)                           # (S, 3, N, l_pad)
            crig = crig_p[..., :lanes]
            ctor = ctor_p[..., :lanes]
            ccrd = ccrd_p[..., :lanes]
            cstat = sstat.reshape(s_steps, 2, l_pad)[..., :lanes]
            cand_e = cstat[:, 0, :].T                     # (L, S)
            accept = cstat[:, 1, :].T > 0.5               # (L, S)

        # final chain state comes straight from the kernel
        conf_f = pd.packed_to_conf(frigid[:, :lanes], ftors[:, :lanes], tp)
        e_f = fstats[0, :lanes]
        coords_f = scatter_batch(fcoords)
        cpos = jnp.transpose(crig[:, 0:3, :], (2, 0, 1))  # (L, S, 3)
        cquat = jnp.transpose(crig[:, 3:7, :], (2, 0, 1))
        ctors = jnp.transpose(ctor[:, 1:1 + tp, :], (2, 0, 1))
        ch = jnp.transpose(ccrd, (3, 0, 2, 1))            # (L, S, NH, 3)
        ccoords = jax.vmap(jax.vmap(_scatter_full, in_axes=(0, None, None)),
                           in_axes=(0, 0, None))(ch, meta.heavy_idx, n_full)

        # best accepted candidate of the chunk = the pending promising pose
        masked_e = jnp.where(accept, cand_e, big)
        idx_best = jnp.argmin(masked_e, axis=1)           # (L,)
        has_acc = jnp.any(accept, axis=1)
        sidx = jnp.arange(s_steps)[None, :]
        last_acc = jnp.max(jnp.where(accept, sidx, -1), axis=1)

        def take(a, idx):
            return jnp.take_along_axis(
                a, idx.reshape((-1, 1) + (1,) * (a.ndim - 2)), axis=1
            ).squeeze(1)

        # full-v refinement of the best accepted candidate of EACH
        # sub-window (refine_subs plain-kernel calls; refine_subs == 1 is
        # the r4 whole-window behavior)
        sub = s_steps // refine_subs
        ref_confs, ref_es, ref_coords, ref_valids = [], [], [], []
        for r in range(refine_subs):
            me_r = masked_e[:, r * sub:(r + 1) * sub]
            idx_r = jnp.argmin(me_r, axis=1) + r * sub    # (L,)
            valid_r = jnp.any(accept[:, r * sub:(r + 1) * sub], axis=1)
            pend_r = Conf(position=take(cpos, idx_r),
                          orientation=take(cquat, idx_r),
                          torsions=take(ctors, idx_r))
            prigid, ptors = pack_conf(pend_r)
            org, otr, rstats, rcoords_h = fused_ref(prigid, ptors,
                                                    scal_full, pack=pack)
            ref_confs.append(pd.packed_to_conf(org[:, :lanes],
                                               otr[:, :lanes], tp))
            ref_es.append(rstats[1, :lanes])
            ref_coords.append(scatter_batch(rcoords_h))
            ref_valids.append(valid_r)

        # chain continues from the refined conf when the pending pose is
        # still the chain head (monte_carlo.cpp:128 semantics); the global
        # best candidate lives in sub-window idx_best // sub — select that
        # sub-window's refined version per lane
        move = jnp.logical_and(has_acc, last_acc == idx_best)
        sb = idx_best // sub                              # (L,)

        def pick(arrs):
            out = arrs[0]
            for r in range(1, refine_subs):
                sel = (sb == r).reshape((-1,) + (1,) * (arrs[r].ndim - 1))
                out = jnp.where(sel, arrs[r], out)
            return out

        rconf = jax.tree_util.tree_map(lambda *xs: pick(list(xs)),
                                       *ref_confs)
        re = pick(ref_es)
        rcoords = pick(ref_coords)

        def msel(a, b):
            mm = move.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(mm, a, b)

        conf = jax.tree_util.tree_map(msel, rconf, conf_f)
        e = jnp.where(move, re, e_f)
        coords = msel(rcoords, coords_f)

        # ONE batched container merge: S accepted candidates + the
        # refine_subs refined poses; rejected slots become empty entries
        # (energy MAX_FL)
        re_col = jnp.stack(ref_es, axis=1)                # (L, R)
        rvalid_col = jnp.stack(ref_valids, axis=1)        # (L, R)
        rcoords_col = jnp.stack(ref_coords, axis=1)       # (L, R, N, 3)
        cand_cont = mc.PoseContainer(
            energy=jnp.concatenate([
                jnp.where(accept, cand_e, MAX_FL),
                jnp.where(rvalid_col, re_col, MAX_FL)], axis=1),
            position=jnp.concatenate(
                [cpos, jnp.stack([c.position for c in ref_confs], axis=1)],
                axis=1),
            orientation=jnp.concatenate(
                [cquat,
                 jnp.stack([c.orientation for c in ref_confs], axis=1)],
                axis=1),
            torsions=jnp.concatenate(
                [ctors, jnp.stack([c.torsions for c in ref_confs], axis=1)],
                axis=1),
            coords=jnp.concatenate([
                jnp.where(accept[:, :, None, None]
                          & meta.heavy_mask[:, None, :, None],
                          ccoords, 1e9),
                jnp.where(rvalid_col[:, :, None, None]
                          & meta.heavy_mask[:, None, :, None],
                          rcoords_col, 1e9)], axis=1))
        cont = v_merge(carry.cont, cand_cont, meta.heavy_mask,
                       params.min_rmsd)

        best_e = jnp.minimum(carry.best_e, jnp.min(masked_e, axis=1))
        best_e = jnp.minimum(
            best_e, jnp.min(jnp.where(rvalid_col, re_col, big), axis=1))

        return mc.MCCarry(conf=conf, e=e, best_e=best_e, cont=cont,
                          coords=coords, pending=conf,
                          pending_valid=jnp.zeros_like(carry.pending_valid),
                          pending_is_current=jnp.zeros_like(
                              carry.pending_is_current)), None

    keys = jax.random.split(key, n_outer)
    final, _ = jax.lax.scan(outer, carry, keys)
    return final
