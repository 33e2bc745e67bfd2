"""Fused device kernel: one whole BFGS pose minimization per pallas_call.

This is the TPU equivalent of the reference's single-kernel GPU minimizer
(reference: gninasrc/gninasrc/bfgs.cu:230-345 runs the entire quasi-Newton
loop — line search, energy/gradient, Hessian update — inside one CUDA
kernel).  On TPU the XLA version of the same loop decomposes into ~100
tiny ops per energy evaluation whose fixed per-op cost (~5 us each on
small tensors) dominates the docking wall clock; fusing the whole
minimization into one Mosaic kernel removes that wall entirely.

Design:
- Poses ("lanes") live on the 128-wide vector lane axis; every quantity is
  an (rows, lanes) tile.  One kernel invocation minimizes LB=128 poses; a
  pallas grid dimension covers larger batches.
- The objective is the EXACT pairwise energy (the reference's
  `non_cache::eval_deriv`, non_cache.cpp:127-180): receptor interactions
  are evaluated analytically per (ligand atom x receptor atom) with the
  box clamp + slope penalty and per-atom curl, intra-ligand 1-4+ pairs as
  a dense masked N x N block with per-pair curl (model.cu:22-36).  Exact
  pairs beat the trilinear cache on TPU: the pair terms are pure VPU math
  at ~0.01 ns/pair, while random-access grid lookups serialize.
- Forward kinematics runs over the BFS-layered tree with one-hot
  parent/node matrices (masked vector selects, no gathers); the gradient
  is the analytic force -> torque reverse pass (tree.h:374-393), not
  autodiff.
- The BFGS loop replicates ops/bfgs.py (itself bfgs.h:357-502) including
  the Armijo line search (bfgs.h:73-91, first-accept semantics), the
  first-step Hessian scaling, the bfgs_update guard, and the final
  restore-if-not-improved (bfgs.h:491, NaN-safe).  The line search runs
  as a lockstep while loop: trials stop as soon as every lane has
  accepted (the batched-XLA version always paid all 10).

Only ligand-only docking with the vina term family (gauss / repulsion /
hydrophobic / non_dir_h_bond — covers vina + vinardo) is fused; flex
residues, covalent complexes, user grids, and exotic terms fall back to
the XLA path in docking.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnina_tpu.constants import IS_HYDROGEN, EPSILON_FL
from gnina_tpu.scoring import terms as T
from gnina_tpu.scoring.weighted import ScoringFunction

LB = 128          # lanes per kernel block
KB = 128          # receptor atoms per inner tile (k pads to a KB multiple;
                  # 128 keeps padding waste ~5% on typical pocket sizes)
NUM_TRIALS = 10   # Armijo halvings (bfgs.h:73-91)
C0 = 1e-4


# --------------------------------------------------------------------------
# scoring-function compatibility: extract static term parameters
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VinaTerms:
    """Static parameters of the fused term family (all python floats)."""

    gauss: Tuple[Tuple[float, float, float], ...]        # (offset, width, w)
    repulsion: Tuple[Tuple[float, float], ...]           # (offset, w)
    hydrophobic: Tuple[Tuple[float, float, float], ...]  # (good, bad, w)
    hbond: Tuple[Tuple[float, float, float], ...]        # (good, bad, w)
    cutoff_sqr: float


def extract_vina_terms(sf: ScoringFunction) -> Optional[VinaTerms]:
    """Return the kernel's term parameters, or None if sf is outside the
    fused family (caller falls back to the XLA path)."""
    gauss, rep, hyd, hb = [], [], [], []
    for t, w in zip(sf.pair_terms, sf.pair_weights):
        if isinstance(t, T.Gauss):
            gauss.append((t.offset, t.width, w))
        elif isinstance(t, T.Repulsion):
            rep.append((t.offset, w))
        elif isinstance(t, T.Hydrophobic):
            hyd.append((t.good, t.bad, w))
        elif isinstance(t, T.NonDirHBond):
            hb.append((t.good, t.bad, w))
        else:
            return None
    return VinaTerms(gauss=tuple(gauss), repulsion=tuple(rep),
                     hydrophobic=tuple(hyd), hbond=tuple(hb),
                     cutoff_sqr=float(sf.cutoff) ** 2)


# --------------------------------------------------------------------------
# host-side pack builder
# --------------------------------------------------------------------------

class DockPack(NamedTuple):
    """Per-lane packed ligand arrays (lane-minor layout) + receptor."""

    lc: jnp.ndarray        # (3, N, L) local coords, heavy atoms only
    ap: jnp.ndarray        # (6, N, L) radius, phi, don, acc, heavy, 0
    nodeoh: jnp.ndarray    # (M, N, L) one-hot node of atom
    parentoh: jnp.ndarray  # (M, M, L) [child, parent] one-hot (root row 0)
    parentohT: jnp.ndarray  # (M, M, L) [parent, child] transpose of above
    relax: jnp.ndarray     # (3, M, L)
    relo: jnp.ndarray      # (3, M, L)
    laymask: jnp.ndarray   # (LY, M, L) 1.0 where layer[m] == l+1
    imask: jnp.ndarray     # (N, N, L) symmetric intra-pair mask
    dofmask: jnp.ndarray   # (D, L)
    rec: jnp.ndarray       # (K, 8) x y z radius phi don acc mask
    heavy_idx: np.ndarray  # (G, N) int, -1 pad: heavy-subset -> full index


def _static_dims(pack: DockPack):
    n = pack.lc.shape[1]
    m = pack.nodeoh.shape[0]
    ly = pack.laymask.shape[0]
    k = pack.rec.shape[0]
    l = pack.lc.shape[2]
    return n, m, ly, k, l


def build_pack(ligs, rec_coords, rec_types, rec_charges, rec_mask,
               exhaustiveness: int, table, m_pad: int = 0,
               shards: int = 1) -> DockPack:
    """Build kernel arrays from host LigandStructs + padded receptor.

    Lane layout: lane = ligand_index * exhaustiveness + chain, padded up
    to a multiple of LB with inert lanes (zero heavy mask / dof mask).
    m_pad: force at least this many tree nodes (so the packed torsion
    layout lines up with an externally chosen Conf slot count).

    shards > 1 lays the lane axis out for an even split over a device
    mesh axis: the real lanes are divided into `shards` contiguous groups
    and each group carries its OWN trailing inert padding up to an LB
    multiple, so slicing the lane axis into `shards` equal pieces gives
    every shard a self-consistent [real | pad] block whose local column
    indices match the (unpadded) carry lanes of that shard.  Requires
    lanes % shards == 0 (the driver pads the ligand list).
    """
    del rec_charges  # vina family has no charge terms
    g = len(ligs)
    heavy_lists = [np.where(~IS_HYDROGEN[l.types])[0] for l in ligs]
    n = max(1, max(len(h) for h in heavy_lists))
    n = ((n + 7) // 8) * 8
    m = max(max(l.num_nodes for l in ligs), m_pad)
    ly = max(int(l.layer.max()) if l.num_nodes > 1 else 1 for l in ligs)
    d = 6 + (m - 1)
    lanes = g * exhaustiveness
    assert lanes % shards == 0, (lanes, shards)
    lps = lanes // shards                       # real lanes per shard
    lps_pad = ((lps + LB - 1) // LB) * LB       # padded lanes per shard
    l_pad = lps_pad * shards

    lc = np.zeros((3, n, lanes), np.float32)
    ap = np.zeros((6, n, lanes), np.float32)
    nodeoh = np.zeros((m, n, lanes), np.float32)
    parentoh = np.zeros((m, m, lanes), np.float32)
    relax = np.zeros((3, m, lanes), np.float32)
    relo = np.zeros((3, m, lanes), np.float32)
    laymask = np.zeros((ly, m, lanes), np.float32)
    imask = np.zeros((n, n, lanes), np.float32)
    dofmask = np.zeros((d, lanes), np.float32)
    heavy_idx = np.full((g, n), -1, np.int64)

    for gi, (lig, hidx) in enumerate(zip(ligs, heavy_lists)):
        sl = slice(gi * exhaustiveness, (gi + 1) * exhaustiveness)
        nh = len(hidx)
        heavy_idx[gi, :nh] = hidx
        remap = -np.ones(lig.num_atoms, np.int64)
        remap[hidx] = np.arange(nh)
        tt = lig.types[hidx]
        lc[:, :nh, sl] = lig.local_coords[hidx].T[:, :, None]
        ap[0, :nh, sl] = table.xs_radius[tt][:, None]
        ap[1, :nh, sl] = table.xs_hydrophobe[tt].astype(np.float32)[:, None]
        ap[2, :nh, sl] = table.xs_donor[tt].astype(np.float32)[:, None]
        ap[3, :nh, sl] = table.xs_acceptor[tt].astype(np.float32)[:, None]
        ap[4, :nh, sl] = 1.0
        nid = lig.node_id[hidx]
        nodeoh[nid, np.arange(nh)[None, :], sl] = 1.0
        mr = lig.num_nodes
        for mi in range(1, mr):
            parentoh[mi, lig.parent[mi], sl] = 1.0
            laymask[lig.layer[mi] - 1, mi, sl] = 1.0
        relax[:, :mr, sl] = lig.rel_axis.T[:, :, None]
        relo[:, :mr, sl] = lig.rel_origin.T[:, :, None]
        for (a, b) in lig.pairs:
            ra, rb = remap[a], remap[b]
            if ra >= 0 and rb >= 0:
                imask[ra, rb, sl] = 1.0
                imask[rb, ra, sl] = 1.0
        dofmask[:6 + lig.num_torsions, sl] = 1.0
        if not lig.has_rigid_dof:
            dofmask[:6, sl] = 0.0

    def padl(x):
        if l_pad != lanes:
            # per-shard trailing pad: (..., shards, lps) -> (..., shards,
            # lps_pad) -> flat; shards == 1 reduces to a plain end pad
            x = x.reshape(x.shape[:-1] + (shards, lps))
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, lps_pad - lps)])
            x = x.reshape(x.shape[:-2] + (l_pad,))
        return jnp.asarray(x)

    k = len(rec_types)
    rec = np.zeros((k, 8), np.float32)
    rec[:, 0:3] = np.asarray(rec_coords, np.float32)
    rt = np.asarray(rec_types)
    rec[:, 3] = table.xs_radius[rt]
    rec[:, 4] = table.xs_hydrophobe[rt]
    rec[:, 5] = table.xs_donor[rt]
    rec[:, 6] = table.xs_acceptor[rt]
    rec[:, 7] = np.asarray(rec_mask, np.float32)

    return DockPack(lc=padl(lc), ap=padl(ap), nodeoh=padl(nodeoh),
                    parentoh=padl(parentoh),
                    parentohT=padl(np.transpose(parentoh, (1, 0, 2))),
                    relax=padl(relax),
                    relo=padl(relo), laymask=padl(laymask),
                    imask=padl(imask), dofmask=padl(dofmask),
                    rec=jnp.asarray(rec), heavy_idx=heavy_idx)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def u01_from_bits(bits):
    """Raw TPU PRNG bits -> uniform floats in [0, 1).

    `pltpu.prng_random_bits` is typed int32, so a bare `bits >> 8` is an
    ARITHMETIC shift that keeps the sign bit and yields draws in [-1, 1).
    Masking to the low 24 bits (exactly a float32 mantissa) after the
    shift makes the draw unsigned regardless of the input sign.
    """
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / 16777216.0)


def _qmul(aw, ax, ay, az, bw, bx, by, bz):
    """Hamilton product on component arrays (quaternion.h:62)."""
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qrotate(qw, qx, qy, qz, vx, vy, vz):
    """v' = v + 2 q_v x (q_v x v + q_w v) (rotation by unit quaternion)."""
    # t = q_v x v
    tx = qy * vz - qz * vy
    ty = qz * vx - qx * vz
    tz = qx * vy - qy * vx
    tx = tx + qw * vx
    ty = ty + qw * vy
    tz = tz + qw * vz
    return (vx + 2.0 * (qy * tz - qz * ty),
            vy + 2.0 * (qz * tx - qx * tz),
            vz + 2.0 * (qx * ty - qy * tx))


def _qnormalize_approx(qw, qx, qy, qz):
    """quaternion.h:242-257: normalize only when off unit by >= 1e-6."""
    s = qw * qw + qx * qx + qy * qy + qz * qz
    needs = jnp.abs(s - 1.0) >= 1e-6
    scale = jnp.where(needs, jax.lax.rsqrt(jnp.maximum(s, EPSILON_FL)), 1.0)
    return qw * scale, qx * scale, qy * scale, qz * scale


def _norm_angle(x):
    return x - (2.0 * np.pi) * jnp.round(x * (0.5 / np.pi))


def _rotvec_quat(rx, ry, rz):
    """Taylor-safe rotation-vector -> quaternion (quaternion.cu:32-43)."""
    a2 = rx * rx + ry * ry + rz * rz
    a = jnp.sqrt(jnp.maximum(a2, 1e-30))
    small = a < 1e-6
    half = 0.5 * a
    c = jnp.cos(half)
    sinc = jnp.where(small, 0.5 - a2 * (1.0 / 48.0), jnp.sin(half) / a)
    return c, sinc * rx, sinc * ry, sinc * rz


def make_bfgs_kernel(terms: VinaTerms, n: int, m: int, ly: int, k: int,
                     l_total: int, maxiters: int, want_metro: bool,
                     interpret: bool = False, debug_grad: bool = False,
                     n_iter: int = 0, done_frac: float = 1.0,
                     mc_steps: int = 0, num_trials: int = NUM_TRIALS,
                     ls_factor: float = 2.0, async_ls: bool = False,
                     async_mc: bool = False, tick_budget: int = 24,
                     warm_ls: bool = False):
    """Build the fused-BFGS callable.

    Returns fn(rigid0 (8,L), tors0 (M,L), scal (12,1), pack arrays...) ->
    (rigid (8,L), tors (M,L), stats (8,L), coords (3,N,L)).

    scal rows: [v_intra, v_inter, slope, v_metro, lo x3, hi x3, pad x2].

    async_mc (requires mc_steps): fully per-lane MC — every lane runs its
    own (step, iteration, trial) state machine and one fused eval per
    tick advances all of them; candidates stream out at the tick they
    complete, flagged, up to mc_steps*tick_budget ticks.  Removes the
    per-step worst-lane BFGS barrier of the lockstep mc loop.
    """
    d = 6 + (m - 1)
    _LOG2_FACTOR = float(np.log2(ls_factor))
    nblk = k // KB
    assert k % KB == 0, "receptor padding must be a multiple of KB"
    grid = l_total // LB
    assert l_total % LB == 0
    # atom loops only need to visit rows holding real heavy atoms; the
    # trailing alignment padding (heavy==0) contributes nothing
    n_eval = min(n, n_iter) if n_iter else n

    def lane_spec(*rows):
        return pl.BlockSpec(tuple(rows) + (LB,),
                            lambda i: tuple(0 for _ in rows) + (i,),
                            memory_space=pltpu.VMEM)

    def kernel(scal, rigid0, tors0, lc, ap, nodeoh, parentoh, parentohT,
               relax, relo, laymask, imask, dofmask, rec, *mc_refs):
        if mc_steps:
            # both MC modes stream conf-only candidates; the host rebuilds
            # coordinates with fk_packed (the XLA twin of fk() below)
            (seed0, ecur0, out_rigid, out_tors, out_stats, out_coords,
             out_srigid, out_stors, out_sstat,
             coords_s, gatom_s, zrow_s, cnt_s) = mc_refs
        else:
            (out_rigid, out_tors, out_stats, out_coords,
             coords_s, gatom_s, zrow_s, cnt_s) = mc_refs
        v0 = scal[0, 0]
        v1 = scal[1, 0]
        slope = scal[2, 0]
        v_metro = scal[3, 0]
        box_lo = (scal[4, 0], scal[5, 0], scal[6, 0])
        box_hi = (scal[7, 0], scal[8, 0], scal[9, 0])

        dofm = dofmask[:]                    # (D, LB)
        # Loop carries initialized from this VMEM row get a concrete vector
        # layout; splat-zero inits are inferred "replicated" by Mosaic and
        # the loop body's real vector then fails to relayout into them.
        zrow_s[:] = rigid0[7:8, :] * 0.0
        cnt_s[0:1, :] = rigid0[7:8, :] * 0.0  # line-search trial evals
        cnt_s[1:2, :] = rigid0[7:8, :] * 0.0  # bfgs iterations executed
        # gatom_s rows >= n_eval (hydrogens / alignment padding: zero
        # energy, zero gradient) are never written by atom_body, but
        # fk_backward reads ALL rows — uninitialized VMEM there is
        # whatever the hardware left behind (interpret mode fills NaN,
        # which poisoned every DOF gradient from the first eval; the
        # ROADMAP "interpret-mode divergence" root cause).  Zero once.
        for c3 in range(3):
            gatom_s[c3] = jnp.zeros((n, LB), jnp.float32)

        def zrow():
            return zrow_s[:]

        # ---------------- forward kinematics -----------------------------
        def fk(rigid, tors):
            """rigid (8,LB), tors (M,LB) -> writes coords_s; returns node
            origins/axes for the backward pass.

            reference: tree.h:322-326 set_conf; ops/fk.py layer scan."""
            pos = [rigid[c:c + 1, :] for c in range(3)]     # 3 x (1,LB)
            quat = [rigid[c:c + 1, :] for c in range(3, 7)]  # 4 x (1,LB)

            row0 = (jax.lax.broadcasted_iota(jnp.int32, (m, LB), 0) == 0)
            # frames: 7 component arrays (M, LB)
            fq = [jnp.where(row0, quat[c], (1.0 if c == 0 else 0.0))
                  for c in range(4)]
            fo = [jnp.where(row0, pos[c], 0.0) for c in range(3)]
            axl = [jnp.zeros((m, LB), jnp.float32) for _ in range(3)]

            half = 0.5 * _norm_angle(tors[:])               # (M, LB)
            ch = jnp.cos(half)
            sh = jnp.sin(half)

            for layer in range(1, ly + 1):
                lm = laymask[layer - 1]                      # (M, LB)
                # parent frame select: frame[parent(child)] as a masked sum
                # over the contracted parent index p (no gathers):
                # pq[child] = sum_p [parent(child)==p] * frame[p]
                pq = [jnp.zeros((m, LB), jnp.float32) for _ in range(4)]
                pO = [jnp.zeros((m, LB), jnp.float32) for _ in range(3)]
                for p_ in range(m):
                    w = parentohT[p_]                        # (M_child, LB)
                    for c in range(4):
                        pq[c] = pq[c] + w * fq[c][p_:p_ + 1, :]
                    for c in range(3):
                        pO[c] = pO[c] + w * fo[c][p_:p_ + 1, :]
                # origin: parent_origin + R(parent_q) rel_origin
                ox, oy, oz = _qrotate(pq[0], pq[1], pq[2], pq[3],
                                      relo[0], relo[1], relo[2])
                no = [pO[0] + ox, pO[1] + oy, pO[2] + oz]
                # lab axis
                ax_, ay_, az_ = _qrotate(pq[0], pq[1], pq[2], pq[3],
                                         relax[0], relax[1], relax[2])
                # torsion quat * parent quat
                tq = _qmul(ch, sh * ax_, sh * ay_, sh * az_,
                           pq[0], pq[1], pq[2], pq[3])
                nq = _qnormalize_approx(*tq)
                for c in range(4):
                    fq[c] = jnp.where(lm > 0, nq[c], fq[c])
                for c in range(3):
                    fo[c] = jnp.where(lm > 0, no[c], fo[c])
                axl[0] = jnp.where(lm > 0, ax_, axl[0])
                axl[1] = jnp.where(lm > 0, ay_, axl[1])
                axl[2] = jnp.where(lm > 0, az_, axl[2])

            # atom coords: per-atom node select + rotate local coords
            qa = [jnp.zeros((n, LB), jnp.float32) for _ in range(4)]
            oa = [jnp.zeros((n, LB), jnp.float32) for _ in range(3)]
            for mm in range(m):
                noh = nodeoh[mm]                             # (N, LB)
                for c in range(4):
                    qa[c] = qa[c] + noh * fq[c][mm:mm + 1, :]
                for c in range(3):
                    oa[c] = oa[c] + noh * fo[c][mm:mm + 1, :]
            rx, ry, rz = _qrotate(qa[0], qa[1], qa[2], qa[3],
                                  lc[0], lc[1], lc[2])
            coords_s[0] = oa[0] + rx
            coords_s[1] = oa[1] + ry
            coords_s[2] = oa[2] + rz
            return fo, axl

        # ---------------- pair terms --------------------------------------
        def pair_e(d_, want_deriv):
            """Vina-family energy (and d/dd) at surface distance d_."""
            e = jnp.zeros_like(d_)
            de = jnp.zeros_like(d_) if want_deriv else None
            for (off, width, w) in terms.gauss:
                dd = (d_ - off) * (1.0 / width)
                g = jnp.exp(-dd * dd)
                e = e + w * g
                if want_deriv:
                    de = de + w * g * (-2.0 / width) * dd
            for (off, w) in terms.repulsion:
                dd = d_ - off
                neg = dd < 0.0
                e = e + w * jnp.where(neg, dd * dd, 0.0)
                if want_deriv:
                    de = de + w * jnp.where(neg, 2.0 * dd, 0.0)
            return e, de

        def ramp_terms(d_, fac_hyd, fac_hb, want_deriv):
            """Hydrophobic + hbond slope_step terms with per-pair factors."""
            e = jnp.zeros_like(d_)
            de = jnp.zeros_like(d_) if want_deriv else None
            for (good, bad, w), fac in (
                    [(t, fac_hyd) for t in terms.hydrophobic]
                    + [(t, fac_hb) for t in terms.hbond]):
                inv = 1.0 / (good - bad)
                frac = (d_ - bad) * inv
                v = jnp.clip(frac, 0.0, 1.0)
                e = e + w * fac * v
                if want_deriv:
                    inside = jnp.logical_and(frac > 0.0, frac < 1.0)
                    de = de + w * fac * jnp.where(inside, inv, 0.0)
            return e, de

        def curl_pair(e, de, v):
            """curl.h:37-42 per element; de scaled by (v/(v+e))^2."""
            tmp = v / jnp.maximum(v + jnp.maximum(e, 0.0), EPSILON_FL)
            cap = e > 0.0
            e2 = jnp.where(cap, e * tmp, e)
            if de is None:
                return e2, None
            return e2, jnp.where(cap, de * tmp * tmp, de)

        # ---------------- energy (+ coordinate gradient) ------------------
        def energy(want_deriv, v_inter, v_intra):
            """Reads coords_s; returns (e_total, e_metro) (1,LB) rows;
            writes gatom_s.

            Receptor part mirrors non_cache.cpp:127-180 (clamp, slope
            penalty, per-atom curl); intra mirrors model.cu:22-36
            (per-pair curl at v_intra).  e_metro is the SAME raw per-atom
            inter sums capped at v_metro instead of v_inter (the search
            igrid's metropolis eval, parallel_mc.cpp:161-162) — folding it
            here makes every BFGS eval carry the metropolis energy for
            free, replacing the old full extra pair pass per MC step."""
            e_tot = zrow()

            def atom_body(a, carry2):
                e_tot, e_met = carry2
                cx = coords_s[0, pl.ds(a, 1), :]
                cy = coords_s[1, pl.ds(a, 1), :]
                cz = coords_s[2, pl.ds(a, 1), :]
                heavy = ap[4, pl.ds(a, 1), :]
                rad_a = ap[0, pl.ds(a, 1), :]
                phi_a = ap[1, pl.ds(a, 1), :]
                don_a = ap[2, pl.ds(a, 1), :]
                acc_a = ap[3, pl.ds(a, 1), :]

                ax_ = jnp.clip(cx, box_lo[0], box_hi[0])
                ay_ = jnp.clip(cy, box_lo[1], box_hi[1])
                az_ = jnp.clip(cz, box_lo[2], box_hi[2])
                oob = (jnp.abs(cx - ax_) + jnp.abs(cy - ay_)
                       + jnp.abs(cz - az_))

                e_a = jnp.zeros((1, LB), jnp.float32)
                gx = jnp.zeros((1, LB), jnp.float32)
                gy = jnp.zeros((1, LB), jnp.float32)
                gz = jnp.zeros((1, LB), jnp.float32)

                # -- receptor interactions, KB-blocked ---------------------
                for kb in range(nblk):
                    blk = rec[kb * KB:(kb + 1) * KB, :]      # (KB, 8)
                    dx = ax_ - blk[:, 0:1]
                    dy = ay_ - blk[:, 1:2]
                    dz = az_ - blk[:, 2:3]
                    r2 = dx * dx + dy * dy + dz * dz
                    # rsqrt: r and 1/r from one transcendental (the deriv
                    # path's gr = de/r divide was a second one)
                    r2c = jnp.maximum(r2, 1e-12)
                    rinv = jax.lax.rsqrt(r2c)
                    r = r2c * rinv
                    d_ = r - (rad_a + blk[:, 3:4])
                    fac_hyd = phi_a * blk[:, 4:5]
                    # h_bond_possible is a boolean OR (everything.h:479):
                    # clamp so donor+acceptor vs donor+acceptor pairs do
                    # not double-count
                    fac_hb = jnp.minimum(
                        don_a * blk[:, 6:7] + acc_a * blk[:, 5:6], 1.0)
                    e1, de1 = pair_e(d_, want_deriv)
                    e2, de2 = ramp_terms(d_, fac_hyd, fac_hb, want_deriv)
                    valid = jnp.logical_and(r2 < terms.cutoff_sqr,
                                            blk[:, 7:8] > 0.0)
                    e_blk = jnp.where(valid, e1 + e2, 0.0)
                    e_a = e_a + jnp.sum(e_blk, axis=0, keepdims=True)
                    if want_deriv:
                        gr = jnp.where(valid, (de1 + de2) * rinv, 0.0)
                        gx = gx + jnp.sum(gr * dx, axis=0, keepdims=True)
                        gy = gy + jnp.sum(gr * dy, axis=0, keepdims=True)
                        gz = gz + jnp.sum(gr * dz, axis=0, keepdims=True)

                # per-atom curl at v_inter + slope penalty; the gradient
                # picks up the (v/(v+e))^2 factor (curl.h:37-42)
                tmp = v_inter / jnp.maximum(
                    v_inter + jnp.maximum(e_a, 0.0), EPSILON_FL)
                cap = e_a > 0.0
                e_curl = jnp.where(cap, e_a * tmp, e_a)
                e_tot = e_tot + heavy * (e_curl + slope * oob)
                # metropolis twin: identical raw sums capped at v_metro
                tmp_m = v_metro / jnp.maximum(
                    v_metro + jnp.maximum(e_a, 0.0), EPSILON_FL)
                e_curl_m = jnp.where(cap, e_a * tmp_m, e_a)
                e_met = e_met + heavy * (e_curl_m + slope * oob)

                if want_deriv:
                    gsc = jnp.where(cap, tmp * tmp, 1.0)
                    # clamp chain: inter grad passes only where unclamped
                    inx = (cx == ax_).astype(jnp.float32)
                    iny = (cy == ay_).astype(jnp.float32)
                    inz = (cz == az_).astype(jnp.float32)
                    gatom_s[0, pl.ds(a, 1), :] = heavy * (
                        gx * gsc * inx + slope * jnp.sign(cx - ax_))
                    gatom_s[1, pl.ds(a, 1), :] = heavy * (
                        gy * gsc * iny + slope * jnp.sign(cy - ay_))
                    gatom_s[2, pl.ds(a, 1), :] = heavy * (
                        gz * gsc * inz + slope * jnp.sign(cz - az_))
                return (e_tot, e_met)

            e_tot, e_met = jax.lax.fori_loop(0, n_eval, atom_body,
                                             (e_tot, zrow()))

            # -- intra pairs: dense masked N x N -------------------------
            def intra_body(a, e_tot):
                cx = coords_s[0, pl.ds(a, 1), :]
                cy = coords_s[1, pl.ds(a, 1), :]
                cz = coords_s[2, pl.ds(a, 1), :]
                rad_a = ap[0, pl.ds(a, 1), :]
                phi_a = ap[1, pl.ds(a, 1), :]
                don_a = ap[2, pl.ds(a, 1), :]
                acc_a = ap[3, pl.ds(a, 1), :]
                mask = imask[pl.ds(a, 1), :, :][0]           # (N, LB)

                dx = cx - coords_s[0]
                dy = cy - coords_s[1]
                dz = cz - coords_s[2]
                r2 = dx * dx + dy * dy + dz * dz
                r2c = jnp.maximum(r2, 1e-12)
                rinv = jax.lax.rsqrt(r2c)
                r = r2c * rinv
                d_ = r - (rad_a + ap[0])
                fac_hyd = phi_a * ap[1]
                fac_hb = jnp.minimum(don_a * ap[3] + acc_a * ap[2], 1.0)
                e1, de1 = pair_e(d_, want_deriv)
                e2, de2 = ramp_terms(d_, fac_hyd, fac_hb, want_deriv)
                e_p = e1 + e2
                de_p = (de1 + de2) if want_deriv else None
                e_p, de_p = curl_pair(e_p, de_p, v_intra)
                valid = jnp.where(r2 < terms.cutoff_sqr, mask, 0.0)
                e_tot = e_tot + 0.5 * jnp.sum(valid * e_p, axis=0,
                                              keepdims=True)
                if want_deriv:
                    gr = valid * de_p * rinv
                    gatom_s[0, pl.ds(a, 1), :] += jnp.sum(
                        gr * dx, axis=0, keepdims=True)
                    gatom_s[1, pl.ds(a, 1), :] += jnp.sum(
                        gr * dy, axis=0, keepdims=True)
                    gatom_s[2, pl.ds(a, 1), :] += jnp.sum(
                        gr * dz, axis=0, keepdims=True)
                return e_tot

            e_tot = jax.lax.fori_loop(0, n_eval, intra_body, e_tot)
            return e_tot, e_met

        # ---------------- FK backward: atom grads -> DOF grads ------------
        def fk_backward(fo, axl):
            """tree.h:374-393: force/torque accumulation up the tree."""
            g0 = gatom_s[0]
            g1 = gatom_s[1]
            g2 = gatom_s[2]
            c0 = coords_s[0]
            c1 = coords_s[1]
            c2 = coords_s[2]
            # cross(r, g) per atom
            crx = c1 * g2 - c2 * g1
            cry = c2 * g0 - c0 * g2
            crz = c0 * g1 - c1 * g0

            rows = [[], [], [], [], [], []]
            for mm in range(m):
                noh = nodeoh[mm]                              # (N, LB)
                rows[0].append(jnp.sum(noh * g0, axis=0, keepdims=True))
                rows[1].append(jnp.sum(noh * g1, axis=0, keepdims=True))
                rows[2].append(jnp.sum(noh * g2, axis=0, keepdims=True))
                rows[3].append(jnp.sum(noh * crx, axis=0, keepdims=True))
                rows[4].append(jnp.sum(noh * cry, axis=0, keepdims=True))
                rows[5].append(jnp.sum(noh * crz, axis=0, keepdims=True))
            F = [jnp.concatenate(rows[c], axis=0) for c in range(3)]
            Tq = [jnp.concatenate(rows[3 + c], axis=0) for c in range(3)]
            # torque about own origin: T -= o x F
            Tq[0] = Tq[0] - (fo[1] * F[2] - fo[2] * F[1])
            Tq[1] = Tq[1] - (fo[2] * F[0] - fo[0] * F[2])
            Tq[2] = Tq[2] - (fo[0] * F[1] - fo[1] * F[0])

            # pass children up, deepest layer first
            for layer in range(ly, 0, -1):
                lm = laymask[layer - 1]                       # (M, LB)
                # P = T + o x F (torque about the global origin)
                Px = lm * (Tq[0] + fo[1] * F[2] - fo[2] * F[1])
                Py = lm * (Tq[1] + fo[2] * F[0] - fo[0] * F[2])
                Pz = lm * (Tq[2] + fo[0] * F[1] - fo[1] * F[0])
                Fx = lm * F[0]
                Fy = lm * F[1]
                Fz = lm * F[2]
                aF = [jnp.zeros((m, LB), jnp.float32) for _ in range(3)]
                aP = [jnp.zeros((m, LB), jnp.float32) for _ in range(3)]
                for mm in range(m):
                    w = parentoh[mm]                          # (M, LB)
                    aF[0] = aF[0] + w * Fx[mm:mm + 1, :]
                    aF[1] = aF[1] + w * Fy[mm:mm + 1, :]
                    aF[2] = aF[2] + w * Fz[mm:mm + 1, :]
                    aP[0] = aP[0] + w * Px[mm:mm + 1, :]
                    aP[1] = aP[1] + w * Py[mm:mm + 1, :]
                    aP[2] = aP[2] + w * Pz[mm:mm + 1, :]
                F[0] = F[0] + aF[0]
                F[1] = F[1] + aF[1]
                F[2] = F[2] + aF[2]
                # back to torque about the parent's origin
                Tq[0] = Tq[0] + aP[0] - (fo[1] * aF[2] - fo[2] * aF[1])
                Tq[1] = Tq[1] + aP[1] - (fo[2] * aF[0] - fo[0] * aF[2])
                Tq[2] = Tq[2] + aP[2] - (fo[0] * aF[1] - fo[1] * aF[0])

            gt = axl[0] * Tq[0] + axl[1] * Tq[1] + axl[2] * Tq[2]  # (M,LB)
            g = jnp.concatenate([
                F[0][0:1, :], F[1][0:1, :], F[2][0:1, :],
                Tq[0][0:1, :], Tq[1][0:1, :], Tq[2][0:1, :],
                gt[1:m, :]], axis=0)                          # (D, LB)
            return g * dofm

        def eval_fg(rigid, tors, want_deriv, v_inter, v_intra):
            frames = fk(rigid, tors)
            e, e_met = energy(want_deriv, v_inter, v_intra)
            if not want_deriv:
                return e, e_met, None
            return e, e_met, fk_backward(*frames)

        # ---------------- conf increment ----------------------------------
        def increment(rigid, tors, p, alpha):
            """conf.h:113-118: pos += a p[:3]; quat = rotvec(a p[3:6]) * quat;
            tors = normalize(tors + normalize(a p[6:]))."""
            px = rigid[0:1, :] + alpha * p[0:1, :]
            py = rigid[1:2, :] + alpha * p[1:2, :]
            pz = rigid[2:3, :] + alpha * p[2:3, :]
            dq = _rotvec_quat(alpha * p[3:4, :], alpha * p[4:5, :],
                              alpha * p[5:6, :])
            q = _qmul(dq[0], dq[1], dq[2], dq[3],
                      rigid[3:4, :], rigid[4:5, :], rigid[5:6, :],
                      rigid[6:7, :])
            q = _qnormalize_approx(*q)
            zero = jnp.zeros((1, LB), jnp.float32)
            dt = jnp.concatenate([zero, alpha * p[6:d, :]], axis=0)  # (M,LB)
            tors_new = _norm_angle(tors + _norm_angle(dt))
            rigid_new = jnp.concatenate(
                [px, py, pz, q[0], q[1], q[2], q[3], zero], axis=0)
            return rigid_new, tors_new

        # ---------------- BFGS loop (bfgs.h:357-502) -----------------------
        eye = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
               ).astype(jnp.float32)[:, :, None] * jnp.ones((1, 1, LB))

        def hdotg(h, g):
            acc = jnp.zeros((d, LB), jnp.float32)
            for e_ in range(d):
                acc = acc + h[:, e_, :] * g[e_:e_ + 1, :]
            return acc

        # done_frac < 1 stops the lockstep loop once that fraction of
        # lanes has converged: the straggler lanes (usually deep clashes
        # that metropolis rejects anyway) stop dominating every step's
        # wall clock.  The reference's per-pose convergence break
        # (bfgs.h gradient tolerance) has the same effect thread-locally.
        done_target = float(int(done_frac * LB))

        def bfgs_run_lockstep(rigid_in, tors_in):
            """One full truncated-BFGS minimization of every lane; returns
            (rigid_out, tors_out, f_out, met_out) with the bfgs.h:491
            restore.  met_out is the metropolis energy at the returned
            pose, carried through the evals (no extra pair pass)."""
            f0_init, met_init, g_init = eval_fg(rigid_in, tors_in,
                                                True, v1, v0)

            def bfgs_cond(st):
                it, rigid, tors, g, h, f0, met, donef = st
                return jnp.logical_and(it < maxiters,
                                       jnp.sum(donef) < done_target)

            st0 = (jnp.int32(0), rigid_in, tors_in, g_init, eye,
                   f0_init, met_init, zrow())
            _, rigid_f, tors_f, _, _, f_f, met_f, _ = jax.lax.while_loop(
                bfgs_cond, bfgs_body, st0)

            # restore original if not improved (bfgs.h:491, NaN-safe)
            improved = f_f <= f0_init
            rigid_out = jnp.where(improved, rigid_f, rigid_in)
            tors_out = jnp.where(improved, tors_f, tors_in)
            f_out = jnp.where(improved, f_f, f0_init)
            met_out = jnp.where(improved, met_f, met_init)
            return rigid_out, tors_out, f_out, met_out

        def bfgs_body(st):
            it, rigid, tors, g, h, f0, met, donef = st
            p = -hdotg(h, g) * dofm                         # (D, LB)
            pg = jnp.sum(p * g, axis=0, keepdims=True)       # (1, LB)

            # lockstep Armijo: stop as soon as every lane accepted
            # boolean vectors are carried as 0/1 f32: Mosaic cannot
            # legalize i1-vector scf.yield operands
            def ls_cond(ls):
                t, acceptedf, *_ = ls
                return jnp.logical_and(t < num_trials,
                                       jnp.sum(acceptedf) < float(LB))

            def ls_body(ls):
                t, acceptedf, srigid, stors, salpha, sf1, smet = ls
                # keep alpha a (1, LB) vector: Mosaic cannot select between
                # a replicated traced scalar and a lane vector
                # backtracking alpha = ls_factor^-t: factor 2 = reference
                # bfgs.h:73-91 halvings; a coarser factor covers the same
                # alpha range in fewer lockstep trials (every lane pays the
                # worst lane's trial count on the VPU)
                alpha = (jnp.exp2(-t.astype(jnp.float32) * _LOG2_FACTOR)
                         * jnp.ones((1, LB), jnp.float32))
                trig, ttors = increment(rigid, tors, p, alpha)
                f1, fm1, _ = eval_fg(trig, ttors, False, v1, v0)
                okf = ((f1 - f0) < C0 * alpha * pg).astype(jnp.float32)
                upd = acceptedf < 0.5  # NaN-safe select, not a blend:
                # 0 * non-finite trial values would poison the carry
                srigid = jnp.where(upd, trig, srigid)
                stors = jnp.where(upd, ttors, stors)
                salpha = jnp.where(upd, alpha, salpha)
                sf1 = jnp.where(upd, f1, sf1)
                smet = jnp.where(upd, fm1, smet)
                return (t + 1, jnp.maximum(acceptedf, okf),
                        srigid, stors, salpha, sf1, smet)

            # lanes with no descent direction (pg >= 0: converged, inert
            # padding, or masked-out DOF) can never satisfy Armijo; mark
            # them accepted up front so they don't force all num_trials
            # evaluations on every other lane (lockstep early exit)
            nodesc = jnp.maximum(donef, (pg >= 0.0).astype(jnp.float32))
            ls0 = (jnp.int32(0), nodesc, rigid, tors, zrow(), f0, met)
            t_end, acceptedf, srigid, stors, salpha, sf1, smet = \
                jax.lax.while_loop(ls_cond, ls_body, ls0)
            ones_row = jnp.ones((1, LB), jnp.float32)
            cnt_s[0:1, :] += t_end.astype(jnp.float32) * ones_row
            cnt_s[1:2, :] += ones_row
            # lanes that never satisfied Armijo take NO step (alpha=0,
            # conf unchanged, y=0 -> ok_h skips the Hessian update)
            # instead of the reference's deepest-trial fallback step
            # (bfgs.h:84-90).  At 10 halvings the fallback step is tiny
            # and harmless, but with the coarser trial schedules this
            # kernel uses to cut worst-lane lockstep cost the fallback
            # was a quality-destroying garbage step (A/B: trials=5
            # factor=2 fell from -8.4 to -7.5 mean best because of it).
            acc = acceptedf > 0.5
            srigid = jnp.where(acc, srigid, rigid)
            stors = jnp.where(acc, stors, tors)
            sf1 = jnp.where(acc, sf1, f0)
            smet = jnp.where(acc, smet, met)
            alpha = jnp.where(acc, salpha, 0.0)

            _, _, g_new = eval_fg(srigid, stors, True, v1, v0)
            y = g_new - g                                    # (D, LB)
            f0_new = sf1
            gsq = jnp.sum(g_new * g_new, axis=0, keepdims=True)
            # a lane that exhausted every trial without an Armijo accept is
            # deterministically stuck (no step -> same g, same H, same p,
            # same trials next iteration): mark it done so it stops forcing
            # the full trial count on every remaining lockstep iteration
            donef_new = jnp.maximum((gsq < 1e-4).astype(jnp.float32),
                                    1.0 - acceptedf)

            # first-step Hessian scaling (bfgs.h:481-486)
            yy = jnp.sum(y * y, axis=0, keepdims=True)
            yp = jnp.sum(y * p, axis=0, keepdims=True)
            scale = jnp.where(jnp.abs(yy) > EPSILON_FL,
                              alpha * yp / jnp.maximum(yy, EPSILON_FL), 1.0)
            # blend (scalar-cond vector select does not legalize in Mosaic);
            # NaN-proof the scale first so 0 * (eye*scale - h) stays finite
            scale = jnp.where(scale == scale, scale, 1.0)
            is0 = (it == 0).astype(jnp.float32)
            h = h + is0 * (eye * scale[None, :, :] - h)

            # bfgs_update (bfgs.h:52-66)
            ok_h = (alpha * yp) >= EPSILON_FL
            mhy = -hdotg(h, y)
            yhy = -jnp.sum(y * mhy, axis=0, keepdims=True)
            r_ = 1.0 / jnp.maximum(alpha * yp, EPSILON_FL)
            coef1 = (alpha * r_)[None, :, :]                 # (1,1,LB)
            coef2 = (alpha * alpha * (r_ * r_ * yhy + r_))[None, :, :]
            outer = coef1 * (mhy[:, None, :] * p[None, :, :]
                             + p[:, None, :] * mhy[None, :, :])
            outer = outer + coef2 * (p[:, None, :] * p[None, :, :])
            use_h = jnp.logical_and(ok_h, donef_new < 0.5)[None, :, :]
            h_new = jnp.where(use_h, h + outer, h)

            return (it + 1, srigid, stors, g_new, h_new, f0_new, smet,
                    donef_new)

        # ---------------- async (per-lane) BFGS ---------------------------
        # Same per-lane math as the lockstep loop — identical trial points,
        # identical accept rule, identical Hessian updates — but each lane
        # advances its OWN (iteration, trial) counters, so one fused
        # value+grad eval per "tick" always does useful work on every lane.
        # The lockstep loop pays the WORST lane's Armijo trial count per
        # iteration (t_worst value evals + 1 grad eval, all lanes stalled);
        # here a lane that accepts its first trial moves straight to its
        # next iteration while a clashing lane keeps backtracking.  The
        # gradient computed at a rejected trial point is discarded, making
        # the per-tick eval ~1.3x a value-only eval — far cheaper than the
        # (t_worst - t_lane) wasted lockstep evals it replaces.
        def bfgs_run_async(rigid_in, tors_in):
            f0_init, met_init, g_init = eval_fg(rigid_in, tors_in,
                                                True, v1, v0)
            max_ticks = maxiters * num_trials + 1

            def a_cond(st):
                tick = st[0]
                donef = st[9]
                return jnp.logical_and(tick < max_ticks,
                                       jnp.sum(donef) < done_target)

            def a_body(st):
                tick, rigid, tors, g, h, f0, met, tl, itl, donef = st
                # direction from the lane's current (h, g); unchanged state
                # on rejected lanes reproduces their previous direction
                p = -hdotg(h, g) * dofm                      # (D, LB)
                pg = jnp.sum(p * g, axis=0, keepdims=True)   # (1, LB)
                # no descent direction -> this lane can never accept again
                # (lockstep idles such lanes to maxiters; final state equal)
                donef = jnp.maximum(donef, (pg >= 0.0).astype(jnp.float32))
                active = donef < 0.5                          # (1, LB) bool

                alpha = jnp.exp2(-tl * _LOG2_FACTOR)          # (1, LB)
                trig, ttors = increment(rigid, tors, p, alpha)
                f1, fm1, g1 = eval_fg(trig, ttors, True, v1, v0)

                okb = jnp.logical_and((f1 - f0) < C0 * alpha * pg, active)
                ok = okb.astype(jnp.float32)
                cnt_s[0:1, :] += active.astype(jnp.float32)
                cnt_s[1:2, :] += ok

                # ----- accept path: BFGS update at the accepted point -----
                y = g1 - g
                yy = jnp.sum(y * y, axis=0, keepdims=True)
                yp = jnp.sum(y * p, axis=0, keepdims=True)
                # first-accepted-iteration Hessian scaling (bfgs.h:481-486)
                scale = jnp.where(jnp.abs(yy) > EPSILON_FL,
                                  alpha * yp / jnp.maximum(yy, EPSILON_FL),
                                  1.0)
                scale = jnp.where(scale == scale, scale, 1.0)
                is0 = ok * (itl == 0.0).astype(jnp.float32)
                h = h + is0 * (eye * scale[None, :, :] - h)

                ok_h = jnp.logical_and(okb, (alpha * yp) >= EPSILON_FL)
                mhy = -hdotg(h, y)
                yhy = -jnp.sum(y * mhy, axis=0, keepdims=True)
                r_ = 1.0 / jnp.maximum(alpha * yp, EPSILON_FL)
                coef1 = (alpha * r_)[None, :, :]
                coef2 = (alpha * alpha * (r_ * r_ * yhy + r_))[None, :, :]
                outer = coef1 * (mhy[:, None, :] * p[None, :, :]
                                 + p[:, None, :] * mhy[None, :, :])
                outer = outer + coef2 * (p[:, None, :] * p[None, :, :])
                gsq = jnp.sum(g1 * g1, axis=0, keepdims=True)
                conv = (gsq < 1e-4).astype(jnp.float32)
                itl_new = itl + ok
                # done: converged, hit the lane's iteration budget, or
                # exhausted every trial without an accept (the lockstep
                # no-step fallback: deterministically stuck)
                tl_rej = tl + 1.0
                stuck = jnp.logical_and(active,
                                        jnp.logical_and(~okb,
                                                        tl_rej
                                                        >= float(num_trials)))
                donef_new = jnp.maximum(
                    donef,
                    jnp.maximum(ok * jnp.maximum(conv,
                                                 (itl_new >= float(maxiters))
                                                 .astype(jnp.float32)),
                                stuck.astype(jnp.float32)))

                use_h = jnp.logical_and(ok_h, donef_new < 0.5)[None, :, :]
                h_new = jnp.where(use_h, h + outer, h)
                rigid_n = jnp.where(okb, trig, rigid)
                tors_n = jnp.where(okb, ttors, tors)
                g_n = jnp.where(okb, g1, g)
                f0_n = jnp.where(okb, f1, f0)
                met_n = jnp.where(okb, fm1, met)
                tl_n = jnp.where(okb, 0.0, jnp.where(active, tl_rej, tl))
                return (tick + 1, rigid_n, tors_n, g_n, h_new, f0_n,
                        met_n, tl_n, itl_new, donef_new)

            st0 = (jnp.int32(0), rigid_in, tors_in, g_init, eye, f0_init,
                   met_init, zrow(), zrow(), zrow())
            st = jax.lax.while_loop(a_cond, a_body, st0)
            rigid_f, tors_f, f_f, met_f = st[1], st[2], st[5], st[6]

            # restore original if not improved (bfgs.h:491, NaN-safe)
            improved = f_f <= f0_init
            rigid_out = jnp.where(improved, rigid_f, rigid_in)
            tors_out = jnp.where(improved, tors_f, tors_in)
            f_out = jnp.where(improved, f_f, f0_init)
            met_out = jnp.where(improved, met_f, met_init)
            return rigid_out, tors_out, f_out, met_out

        bfgs_run = bfgs_run_async if async_ls else bfgs_run_lockstep

        # NOTE: the metropolis energy (inter-only at v_metro,
        # parallel_mc.cpp:161-162) is folded into energy() above — every
        # BFGS eval carries it, so no separate pair pass is needed.

        if debug_grad:
            # test hook: dump the initial DOF gradient into out_coords
            rigid_in = rigid0[:]
            tors_in = tors0[:]
            f0_init, _, g_init = eval_fg(rigid_in, tors_in, True, v1, v0)
            out_rigid[:] = rigid_in
            out_tors[:] = tors_in
            out_stats[:] = jnp.concatenate(
                [f0_init, jnp.zeros((7, LB), jnp.float32)], axis=0)
            gd = jnp.concatenate(
                [g_init, jnp.zeros((3 * n - d, LB), jnp.float32)], axis=0)
            out_coords[0] = gd[0:n, :]
            out_coords[1] = gd[n:2 * n, :]
            out_coords[2] = gd[2 * n:3 * n, :]
            return

        if not mc_steps:
            rigid_out, tors_out, f_out, met_out = bfgs_run(rigid0[:],
                                                           tors0[:])
            out_rigid[:] = rigid_out
            out_tors[:] = tors_out
            fk(rigid_out, tors_out)
            if want_metro:
                e_metro = met_out
            else:
                e_metro = jnp.zeros((1, LB), jnp.float32)
            stats = jnp.concatenate(
                [f_out, e_metro, cnt_s[0:1, :], cnt_s[1:2, :],
                 jnp.zeros((4, LB), jnp.float32)], axis=0)
            out_stats[:] = stats
            out_coords[0] = coords_s[0]
            out_coords[1] = coords_s[1]
            out_coords[2] = coords_s[2]
            return

        # ---------------- in-kernel Monte Carlo ---------------------------
        # monte_carlo.cpp:99-148 step loop with the mutation draw of
        # mutate.cpp:35-73 and metropolis at temperature scal[11]; the
        # host-side container/pending bookkeeping consumes the per-step
        # candidate stream (out_s*).
        pltpu.prng_seed(seed0[0, 0] + pl.program_id(0))
        amp = scal[10, 0]
        temp = scal[11, 0]
        hasrig = dofm[0:1, :]                       # (1, LB)
        ntors_row = jnp.sum(dofm[6:d, :], axis=0, keepdims=True)

        def u01(shape):
            return u01_from_bits(pltpu.prng_random_bits(shape))

        def rand_sphere():
            """Uniform point in the unit ball per lane (random_inside_sphere:
            normal direction x cbrt(U))."""
            u1 = jnp.maximum(u01((1, LB)), 1e-7)
            u2 = u01((1, LB))
            u3 = jnp.maximum(u01((1, LB)), 1e-7)
            u4 = u01((1, LB))
            r1 = jnp.sqrt(-2.0 * jnp.log(u1))
            r2 = jnp.sqrt(-2.0 * jnp.log(u3))
            n1 = r1 * jnp.cos(2.0 * np.pi * u2)
            n2 = r1 * jnp.sin(2.0 * np.pi * u2)
            n3 = r2 * jnp.cos(2.0 * np.pi * u4)
            inv = jax.lax.rsqrt(n1 * n1 + n2 * n2 + n3 * n3 + 1e-12)
            rad = jnp.exp(jnp.log(jnp.maximum(u01((1, LB)), 1e-7)) / 3.0)
            sc = inv * rad
            return n1 * sc, n2 * sc, n3 * sc

        def gyration(rigid):
            """Heavy-atom RMS distance from the root origin on coords_s
            (model.cpp:1002)."""
            dx = coords_s[0] - rigid[0:1, :]
            dy = coords_s[1] - rigid[1:2, :]
            dz = coords_s[2] - rigid[2:3, :]
            hv = ap[4]
            d2 = jnp.sum(hv * (dx * dx + dy * dy + dz * dz),
                         axis=0, keepdims=True)
            cnt = jnp.maximum(jnp.sum(hv, axis=0, keepdims=True), 1.0)
            return jnp.sqrt(d2 / cnt)

        def mutate(rigid, tors, gr):
            """One-DOF mutation (mutate.cpp:35-73): position, orientation,
            or one torsion redraw, drawn uniformly."""
            lo_row = 2.0 * (1.0 - hasrig)
            span = ntors_row + 2.0 - lo_row
            which = jnp.floor(lo_row + u01((1, LB)) * span)
            which = jnp.minimum(which, ntors_row + 1.0)

            sx, sy, sz = rand_sphere()
            pos_sel = which < 0.5
            px = jnp.where(pos_sel, rigid[0:1, :] + amp * sx, rigid[0:1, :])
            py = jnp.where(pos_sel, rigid[1:2, :] + amp * sy, rigid[1:2, :])
            pz = jnp.where(pos_sel, rigid[2:3, :] + amp * sz, rigid[2:3, :])

            ox, oy, oz = rand_sphere()
            rs = amp / jnp.maximum(gr, EPSILON_FL)
            dq = _rotvec_quat(rs * ox, rs * oy, rs * oz)
            q = _qmul(dq[0], dq[1], dq[2], dq[3],
                      rigid[3:4, :], rigid[4:5, :], rigid[5:6, :],
                      rigid[6:7, :])
            q = _qnormalize_approx(*q)
            ori_sel = jnp.logical_and(
                jnp.logical_and(which >= 0.5, which < 1.5),
                gr > EPSILON_FL)
            qw = jnp.where(ori_sel, q[0], rigid[3:4, :])
            qx = jnp.where(ori_sel, q[1], rigid[4:5, :])
            qy = jnp.where(ori_sel, q[2], rigid[5:6, :])
            qz = jnp.where(ori_sel, q[3], rigid[6:7, :])

            tor_sel = which >= 1.5
            tidx = which - 2.0
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (m, LB), 0).astype(jnp.float32)  # row j = tors j-1
            row_sel = jnp.logical_and(rows == (tidx + 1.0), tor_sel)
            newt = u01((1, LB)) * (2.0 * np.pi) - np.pi
            tors_new = jnp.where(row_sel, newt, tors)

            rigid_new = jnp.concatenate(
                [px, py, pz, qw, qx, qy, qz,
                 jnp.zeros((1, LB), jnp.float32)], axis=0)
            return rigid_new, tors_new

        if async_mc:
            # ---------- fully per-lane MC (no per-step barrier) ----------
            # Each lane runs its own (step, iteration, trial) counters;
            # every tick does ONE fused value+grad eval that advances all
            # active lanes: lanes in "start" phase evaluate a fresh
            # mutation of their chain state (the f0_init eval), lanes
            # mid-BFGS evaluate their next Armijo trial.  A lane whose
            # BFGS finishes runs metropolis the same tick, streams the
            # candidate at the (scalar) tick row with a completed flag,
            # and re-enters start phase.  The lockstep mc loop below pays
            # the worst lane's BFGS tick count on EVERY step; here lanes
            # only wait for each other at the very end of the whole
            # mc_steps window (tick budget mc_steps*tick_budget bounds
            # the tail; lanes past their budget simply stop early and the
            # chain state carries to the next invocation).
            t_total = mc_steps * tick_budget
            s_f = float(mc_steps)
            # The candidate stream is COMPLETION-INDEXED: a lane's j-th
            # completed MC step lands at row j via a one-hot accumulate on
            # its step counter (VPU lanes cannot scatter, but a (S, LB)
            # select against a row iota can).  Stream VMEM is S rows per
            # component — independent of tick_budget — so long windows
            # with pooled tick budgets are feasible.  Accumulating into
            # outputs requires zeroed buffers (rows a budget-exhausted
            # lane never completes must read as flag 0 on the host).
            out_srigid[:] = jnp.zeros((8 * mc_steps, LB), jnp.float32)
            out_stors[:] = jnp.zeros((m * mc_steps, LB), jnp.float32)
            out_sstat[:] = jnp.zeros((3 * mc_steps, LB), jnp.float32)
            # int32 iota, f32 compare target: Mosaic's tpu.iota only
            # produces integer vectors
            step_iota = jax.lax.broadcasted_iota(
                jnp.int32, (mc_steps, LB), 0).astype(jnp.float32)

            fk(rigid0[:], tors0[:])
            gr0 = gyration(rigid0[:])
            zd = dofm * 0.0                             # (D, LB) zeros

            def amc_cond(st):
                tick = st[0]
                stepc = st[14]
                return jnp.logical_and(
                    tick < t_total,
                    jnp.sum((stepc < s_f).astype(jnp.float32)) > 0.5)

            def amc_body(st):
                # the warm-LS alpha memory is carried ONLY when warm_ls is
                # on, so the default program is byte-identical to the
                # certified fixed-start one (same compile cache key)
                (tick, crigid, ctors, e_cur, gr_cur,
                 rigid, tors, g, h, f0, met, gr_cand,
                 tl, itl, stepc, phase) = st[:16]
                wa = st[16] if warm_ls else 0.0
                activeb = stepc < s_f                    # (1, LB) bool
                activef = activeb.astype(jnp.float32)

                # fresh mutation of the chain state (start lanes use it)
                mrigid, mtors = mutate(crigid, ctors, gr_cur)

                # Armijo trial point (mid-BFGS lanes use it).  Warm-started
                # per-lane line search: trials begin ONE notch above the
                # lane's last ACCEPTED step size (wa) instead of at
                # alpha=1 every iteration — successive BFGS steps on the
                # same pose accept at similar alphas, so the cold
                # walk-down from 1 (~5-6 rejected evals per iteration,
                # each a full pair-loop tick) is paid once per lane, not
                # once per iteration.  Departure from bfgs.h:73's
                # fixed-start halving schedule is quality-gated
                # (scripts/quality_gate.py affinity + pose geometry).
                p = -hdotg(h, g) * dofm
                pg = jnp.sum(p * g, axis=0, keepdims=True)
                base = jnp.maximum(wa - 1.0, 0.0) if warm_ls else 0.0
                expnt = (base + tl) if warm_ls else tl
                alpha = jnp.exp2(-expnt * _LOG2_FACTOR)
                trig, ttors = increment(rigid, tors, p, alpha)

                startb = phase > 0.5
                erig = jnp.where(startb, mrigid, trig)
                etors = jnp.where(startb, mtors, ttors)

                f1, fm1, g1 = eval_fg(erig, etors, True, v1, v0)
                gy1 = gyration(erig)
                cnt_s[0:1, :] += activef

                is_start = jnp.logical_and(startb, activeb)
                is_bfgs = jnp.logical_and(~startb, activeb)

                # ---- BFGS accept/reject (same per-lane math as
                # bfgs_run_async; no-step fallback on trial exhaustion) --
                nodesc = jnp.logical_and(is_bfgs, pg >= 0.0)
                okb = jnp.logical_and(
                    jnp.logical_and((f1 - f0) < C0 * alpha * pg, is_bfgs),
                    ~nodesc)
                ok = okb.astype(jnp.float32)
                cnt_s[1:2, :] += ok

                y = g1 - g
                yy = jnp.sum(y * y, axis=0, keepdims=True)
                yp = jnp.sum(y * p, axis=0, keepdims=True)
                scale = jnp.where(jnp.abs(yy) > EPSILON_FL,
                                  alpha * yp / jnp.maximum(yy, EPSILON_FL),
                                  1.0)
                scale = jnp.where(scale == scale, scale, 1.0)
                is0 = ok * (itl == 0.0).astype(jnp.float32)
                h = h + is0 * (eye * scale[None, :, :] - h)
                ok_h = jnp.logical_and(okb, (alpha * yp) >= EPSILON_FL)
                mhy = -hdotg(h, y)
                yhy = -jnp.sum(y * mhy, axis=0, keepdims=True)
                r_ = 1.0 / jnp.maximum(alpha * yp, EPSILON_FL)
                coef1 = (alpha * r_)[None, :, :]
                coef2 = (alpha * alpha * (r_ * r_ * yhy + r_))[None, :, :]
                outer = coef1 * (mhy[:, None, :] * p[None, :, :]
                                 + p[:, None, :] * mhy[None, :, :])
                outer = outer + coef2 * (p[:, None, :] * p[None, :, :])
                h = jnp.where(ok_h[None, :, :], h + outer, h)
                # start lanes open a fresh candidate: identity Hessian
                h = jnp.where(is_start[None, :, :], eye, h)

                gsq = jnp.sum(g1 * g1, axis=0, keepdims=True)
                conv_ok = jnp.logical_and(okb, gsq < 1e-4)
                itl_acc = itl + ok
                budget_ok = jnp.logical_and(okb,
                                            itl_acc >= float(maxiters))
                tl_rej = tl + 1.0
                rejb = jnp.logical_and(is_bfgs,
                                       jnp.logical_and(~okb, ~nodesc))
                stuck = jnp.logical_and(rejb, tl_rej >= float(num_trials))
                cdone = jnp.logical_or(
                    nodesc, jnp.logical_or(
                        stuck, jnp.logical_or(conv_ok, budget_ok)))

                upd = jnp.logical_or(okb, is_start)
                rigid_n = jnp.where(okb, trig,
                                    jnp.where(is_start, mrigid, rigid))
                tors_n = jnp.where(okb, ttors,
                                   jnp.where(is_start, mtors, tors))
                g_n = jnp.where(upd, g1, g)
                f0_n = jnp.where(upd, f1, f0)
                met_n = jnp.where(upd, fm1, met)
                gr_cand_n = jnp.where(upd, gy1, gr_cand)
                itl_n = jnp.where(is_start, 0.0,
                                  jnp.where(okb, itl_acc, itl))
                tl_n = jnp.where(jnp.logical_or(is_start, okb), 0.0,
                                 jnp.where(rejb, tl_rej, tl))
                # warm line-search memory: the accepted exponent.  Reset
                # COLD on minimization start — warm memory is only valid
                # WITHIN one BFGS minimization (successive iterations on
                # the same pose accept at similar alphas); a fresh
                # mutation needs the full alpha=1 first trial, and a
                # stale deep exponent from the previous candidate's
                # converged tail cripples early descent (measured: gate
                # fail, 10gs gap 0.31 with cross-candidate carry).
                if warm_ls:
                    wa_n = jnp.where(is_start, 0.0,
                                     jnp.where(okb, base + tl, wa))

                # ---- MC step completion: metropolis at the carried
                # metro energy of the candidate's final pose ------------
                e_new = met_n
                u = u01((1, LB))
                macc = jnp.logical_and(cdone, jnp.logical_or(
                    e_new < e_cur,
                    u < jnp.exp((e_cur - e_new) / temp)))
                crigid_n = jnp.where(macc, rigid_n, crigid)
                ctors_n = jnp.where(macc, tors_n, ctors)
                e_cur_n = jnp.where(macc, e_new, e_cur)
                gr_cur_n = jnp.where(macc, gr_cand_n, gr_cur)
                stepc_n = stepc + cdone.astype(jnp.float32)
                phase_n = jnp.where(cdone, 1.0,
                                    jnp.where(is_start, 0.0, phase))

                # completion-indexed stream write: one-hot row = the
                # lane's (pre-increment) step counter, gated on cdone.
                # where-selects, not multiplies: 0 * non-finite candidate
                # values would poison the accumulated buffer (NaN rule).
                oh = jnp.logical_and(step_iota == stepc, cdone)  # (S, LB)
                for c in range(8):
                    out_srigid[pl.ds(c * mc_steps, mc_steps), :] += \
                        jnp.where(oh, rigid_n[c:c + 1, :], 0.0)
                for c in range(m):
                    out_stors[pl.ds(c * mc_steps, mc_steps), :] += \
                        jnp.where(oh, tors_n[c:c + 1, :], 0.0)
                out_sstat[pl.ds(0, mc_steps), :] += jnp.where(oh, e_new, 0.0)
                out_sstat[pl.ds(mc_steps, mc_steps), :] += jnp.where(
                    jnp.logical_and(oh, macc), 1.0, 0.0)
                out_sstat[pl.ds(2 * mc_steps, mc_steps), :] += jnp.where(
                    oh, 1.0, 0.0)

                nxt = (tick + 1, crigid_n, ctors_n, e_cur_n, gr_cur_n,
                       rigid_n, tors_n, g_n, h, f0_n, met_n, gr_cand_n,
                       tl_n, itl_n, stepc_n, phase_n)
                return nxt + (wa_n,) if warm_ls else nxt

            st0 = (jnp.int32(0), rigid0[:], tors0[:], ecur0[:], gr0,
                   rigid0[:], tors0[:], zd, eye, zrow(), zrow(), gr0,
                   zrow(), zrow(), zrow(), zrow() + 1.0)
            if warm_ls:
                st0 = st0 + (zrow(),)
            st = jax.lax.while_loop(amc_cond, amc_body, st0)
            crigid_f, ctors_f, e_f, stepc_f = st[1], st[2], st[3], st[14]
            out_rigid[:] = crigid_f
            out_tors[:] = ctors_f
            out_stats[:] = jnp.concatenate(
                [e_f, e_f, cnt_s[0:1, :], cnt_s[1:2, :], stepc_f,
                 jnp.zeros((3, LB), jnp.float32)], axis=0)
            fk(crigid_f, ctors_f)
            out_coords[0] = coords_s[0]
            out_coords[1] = coords_s[1]
            out_coords[2] = coords_s[2]
            return

        def mc_body(step, carry):
            rigid, tors, e_cur = carry
            fk(rigid, tors)                     # coords for gyration radius
            gr = gyration(rigid)
            crigid, ctors = mutate(rigid, tors, gr)
            nrigid, ntors_, f_out, e_new = bfgs_run(crigid, ctors)
            u = u01((1, LB))
            accept = jnp.logical_or(
                e_new < e_cur,
                u < jnp.exp((e_cur - e_new) / temp))
            acceptf = accept.astype(jnp.float32)

            out_srigid[pl.ds(step * 8, 8), :] = nrigid
            out_stors[pl.ds(step * m, m), :] = ntors_
            out_sstat[pl.ds(step * 2, 2), :] = jnp.concatenate(
                [e_new, acceptf], axis=0)

            rigid2 = jnp.where(accept, nrigid, rigid)
            tors2 = jnp.where(accept, ntors_, tors)
            e2 = jnp.where(accept, e_new, e_cur)
            return (rigid2, tors2, e2)

        rigid_f, tors_f, e_f = jax.lax.fori_loop(
            0, mc_steps, mc_body, (rigid0[:], tors0[:], ecur0[:]))
        out_rigid[:] = rigid_f
        out_tors[:] = tors_f
        stats = jnp.concatenate(
            [e_f, e_f, cnt_s[0:1, :], cnt_s[1:2, :],
             jnp.zeros((4, LB), jnp.float32)], axis=0)
        out_stats[:] = stats
        out_coords[0] = coords_s[0]
        out_coords[1] = coords_s[1]
        out_coords[2] = coords_s[2]

    in_specs = [
        pl.BlockSpec((12, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),       # scal
        lane_spec(8),                                # rigid0
        lane_spec(m),                                # tors0
        lane_spec(3, n),                             # lc
        lane_spec(6, n),                             # ap
        lane_spec(m, n),                             # nodeoh
        lane_spec(m, m),                             # parentoh
        lane_spec(m, m),                             # parentohT
        lane_spec(3, m),                             # relax
        lane_spec(3, m),                             # relo
        lane_spec(ly, m),                            # laymask
        lane_spec(n, n),                             # imask
        lane_spec(d),                                # dofmask
        pl.BlockSpec((k, 8), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),       # rec
    ]
    out_specs = [lane_spec(8), lane_spec(m), lane_spec(8), lane_spec(3, n)]
    out_shape = [
        jax.ShapeDtypeStruct((8, l_total), jnp.float32),
        jax.ShapeDtypeStruct((m, l_total), jnp.float32),
        jax.ShapeDtypeStruct((8, l_total), jnp.float32),
        jax.ShapeDtypeStruct((3, n, l_total), jnp.float32),
    ]
    if mc_steps:
        in_specs += [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # seed0
            lane_spec(1),                            # ecur0
        ]
        if async_mc:
            # completion-indexed stream: component-major (C * S, L) slabs,
            # independent of tick_budget (see the one-hot accumulate above)
            out_specs += [lane_spec(8 * mc_steps), lane_spec(m * mc_steps),
                          lane_spec(3 * mc_steps)]
            out_shape += [
                jax.ShapeDtypeStruct((8 * mc_steps, l_total), jnp.float32),
                jax.ShapeDtypeStruct((m * mc_steps, l_total), jnp.float32),
                jax.ShapeDtypeStruct((3 * mc_steps, l_total), jnp.float32),
            ]
        else:
            out_specs += [lane_spec(mc_steps * 8), lane_spec(mc_steps * m),
                          lane_spec(mc_steps * 2)]
            out_shape += [
                jax.ShapeDtypeStruct((mc_steps * 8, l_total), jnp.float32),
                jax.ShapeDtypeStruct((mc_steps * m, l_total), jnp.float32),
                jax.ShapeDtypeStruct((mc_steps * 2, l_total), jnp.float32),
            ]

    if interpret is True and mc_steps:
        # the plain (HLO) interpreter has no lowering for the TPU PRNG
        # primitives (prng_seed/prng_random_bits); the Mosaic TPU
        # interpreter simulates them faithfully on CPU
        interpret = pltpu.InterpretParams()
    fn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, n, LB), jnp.float32),         # coords_s
            pltpu.VMEM((3, n, LB), jnp.float32),         # gatom_s
            pltpu.VMEM((1, LB), jnp.float32),            # zrow_s
            pltpu.VMEM((2, LB), jnp.float32),            # cnt_s
        ],
        interpret=interpret,
    )
    return fn


# --------------------------------------------------------------------------
# XLA-facing wrapper: pytree Conf <-> packed lane-minor layout
# --------------------------------------------------------------------------

def fk_packed(rigid, tors, pack: "DockPack"):
    """Kernel-equivalent FK in plain XLA: (8, L), (M, L) -> coords (3, N, L).

    Mirrors make_bfgs_kernel's fk() so hosts can reconstruct coordinates
    of streamed candidates (the async MC stream carries conf only)."""
    m = pack.nodeoh.shape[0]
    ly = pack.laymask.shape[0]
    # the kernel fk() accumulates in full f32; these einsums must match
    # it, but TPU dot_general defaults to bf16 MXU inputs, which
    # quantizes ~15 A origins to ~0.06 A steps — force f32 precision
    hi = jax.lax.Precision.HIGHEST
    pos = rigid[0:3]                                      # (3, L)
    quat = rigid[3:7]                                     # (4, L)
    row0 = (jnp.arange(m) == 0)[None, :, None]
    ident = jnp.asarray([1.0, 0.0, 0.0, 0.0],
                        jnp.float32).reshape(4, 1, 1)
    fq = jnp.where(row0, quat[:, None, :], ident)         # (4, M, L)
    fo = jnp.where(row0, pos[:, None, :], 0.0)            # (3, M, L)
    half = 0.5 * _norm_angle(tors)                        # (M, L)
    ch, sh = jnp.cos(half), jnp.sin(half)
    for layer in range(1, ly + 1):
        lm = pack.laymask[layer - 1]                      # (M, L)
        pq = jnp.einsum("pml,cpl->cml", pack.parentohT, fq, precision=hi)
        pO = jnp.einsum("pml,cpl->cml", pack.parentohT, fo, precision=hi)
        ox, oy, oz = _qrotate(pq[0], pq[1], pq[2], pq[3],
                              pack.relo[0], pack.relo[1], pack.relo[2])
        no = jnp.stack([pO[0] + ox, pO[1] + oy, pO[2] + oz])
        ax_, ay_, az_ = _qrotate(pq[0], pq[1], pq[2], pq[3],
                                 pack.relax[0], pack.relax[1],
                                 pack.relax[2])
        tq = _qmul(ch, sh * ax_, sh * ay_, sh * az_,
                   pq[0], pq[1], pq[2], pq[3])
        nq = jnp.stack(_qnormalize_approx(*tq))
        fq = jnp.where(lm > 0, nq, fq)
        fo = jnp.where(lm > 0, no, fo)
    qa = jnp.einsum("mnl,cml->cnl", pack.nodeoh, fq, precision=hi)
    oa = jnp.einsum("mnl,cml->cnl", pack.nodeoh, fo, precision=hi)
    rx, ry, rz = _qrotate(qa[0], qa[1], qa[2], qa[3],
                          pack.lc[0], pack.lc[1], pack.lc[2])
    return jnp.stack([oa[0] + rx, oa[1] + ry, oa[2] + rz])


def conf_to_packed(conf, m: int):
    """Conf pytree with leading lane axis (L, ...) -> (8, L), (M, L)."""
    pos = conf.position.T                                  # (3, L)
    quat = conf.orientation.T                              # (4, L)
    l = pos.shape[1]
    rigid = jnp.concatenate([pos, quat,
                             jnp.zeros((1, l), jnp.float32)], axis=0)
    t = conf.torsions.shape[-1]
    tt = conf.torsions.T[:m - 1]       # extra slots are padding: truncate
    parts = [jnp.zeros((1, l), jnp.float32), tt]
    if t < m - 1:
        parts.append(jnp.zeros((m - 1 - t, l), jnp.float32))
    return rigid, jnp.concatenate(parts, axis=0)


def packed_to_conf(rigid, tors, t: int):
    from gnina_tpu.types import Conf

    return Conf(position=rigid[0:3, :].T,
                orientation=rigid[3:7, :].T,
                torsions=tors[1:1 + t, :].T)


class FusedBfgs:
    """Jit-friendly handle: builds/caches the kernel for one shape bucket."""

    def __init__(self, sf: ScoringFunction, pack: DockPack, maxiters: int,
                 want_metro: bool = True, interpret: Optional[bool] = None,
                 debug_grad: bool = False, n_iter: int = 0,
                 done_frac: float = 1.0, mc_steps: int = 0,
                 shards: int = 1, num_trials: int = NUM_TRIALS,
                 ls_factor: float = 2.0, async_ls: bool = False,
                 async_mc: bool = False, tick_budget: int = 24,
                 warm_ls: bool = False):
        """shards > 1: the kernel is built for ONE shard of a lane axis
        laid out by build_pack(shards=...) and must be invoked inside a
        shard_map body with the pack's lane axis split over the mesh."""
        terms = extract_vina_terms(sf)
        if terms is None:
            raise ValueError("scoring function outside the fused family")
        n, m, ly, k, l = _static_dims(pack)
        assert l % shards == 0, (l, shards)
        l = l // shards
        self.pack = pack
        self.m = m
        self.n = n
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.mc_steps = mc_steps
        self.async_mc = bool(async_mc)
        self.tick_budget = int(tick_budget)
        self.fn = make_bfgs_kernel(terms, n, m, ly, k, l, maxiters,
                                   want_metro, interpret=interpret,
                                   debug_grad=debug_grad, n_iter=n_iter,
                                   done_frac=done_frac, mc_steps=mc_steps,
                                   num_trials=num_trials,
                                   ls_factor=ls_factor, async_ls=async_ls,
                                   async_mc=async_mc,
                                   tick_budget=tick_budget,
                                   warm_ls=warm_ls)

    def scal(self, v_intra, v_inter, slope, v_metro, lo, hi,
             amplitude=2.0, temperature=1.2):
        return jnp.concatenate([
            jnp.asarray([v_intra, v_inter, slope, v_metro], jnp.float32),
            jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            jnp.asarray([amplitude, temperature],
                        jnp.float32)]).reshape(12, 1)

    def __call__(self, rigid, tors, scal, pack: Optional[DockPack] = None):
        p = self.pack if pack is None else pack
        assert not self.mc_steps, "use run_mc for an MC-mode kernel"
        return self.fn(scal, rigid, tors, p.lc, p.ap, p.nodeoh, p.parentoh,
                       p.parentohT, p.relax, p.relo, p.laymask, p.imask,
                       p.dofmask, p.rec)

    def run_mc(self, rigid, tors, scal, seed, ecur,
               pack: Optional[DockPack] = None):
        """mc_steps in-kernel MC steps from (rigid, tors, ecur).

        Returns (rigid', tors', stats, coords, step_rigid, step_tors,
        step_stat): step_* stack the per-step (lockstep mode) or per-tick
        (async_mc mode, completion-flagged) minimized candidates, conf
        only — hosts rebuild coordinates with fk_packed."""
        p = self.pack if pack is None else pack
        seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
        return self.fn(scal, rigid, tors, p.lc, p.ap, p.nodeoh, p.parentoh,
                       p.parentohT, p.relax, p.relo, p.laymask, p.imask,
                       p.dofmask, p.rec, seed, ecur)
