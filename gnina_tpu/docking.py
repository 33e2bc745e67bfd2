"""End-to-end docking engine: the TPU-native equivalent of gnina's
main_procedure/do_search (reference: gninasrc/main/main.cpp:210-530).

Pipeline per ligand:
  host ingest -> padded arrays -> jitted [vmapped MC chains -> merge ->
  batched refinement] -> exact rescore + conf-independent -> sort/filter ->
  results.

The reference's `exhaustiveness` thread pool becomes a chain batch dimension;
all chains of one ligand run in a single compiled program resident on the
accelerator.
"""

from __future__ import annotations

import dataclasses
import functools
import sys
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.chem.ingest import Receptor, box_from_center_size
from gnina_tpu.chem.tree_build import LigandStruct
from gnina_tpu.constants import MAX_FL
from gnina_tpu.ops import cache_grid as cg
from gnina_tpu.ops import fk, mc
from gnina_tpu.ops.bfgs import MinimizeParams, bfgs
from gnina_tpu.ops.energy import Box, make_energy_fn
from gnina_tpu.scoring.builtin import get_scoring_function
from gnina_tpu.scoring.weighted import ScoringFunction
from gnina_tpu.types import Conf, LigandData, ReceptorData, pad_ligand, \
    pad_receptor, initial_conf


@dataclasses.dataclass
class DockSettings:
    scoring: str = "vina"
    exhaustiveness: int = 8
    num_modes: int = 9
    num_mc_saved: int = 50
    out_min_rmsd: float = 1.0
    forcecap: float = 1000.0
    seed: int = 0
    num_mc_steps: int = 0          # 0 -> heuristic
    max_mc_steps: int = 0
    refine_stride: int = 8         # full-v refinement cadence (mc.MCParams);
                                   # every-8-steps-all-lanes is still MORE
                                   # refinement than the reference's rare
                                   # promising-step cadence; A/B at 1024
                                   # steps: equal pose quality, ~9% faster
    # value+grad at all 10 Armijo trials at once.  OFF by default: with the
    # cell-row gather layout the 10 forward trials cost ~1 eval, so paying
    # 10 full gradients per iteration is a net loss (measured on v5e).
    fused_line_search: bool = False
    temperature: float = 1.2
    autobox_add: float = 4.0
    minimize_iters: int = 0        # 0 -> heuristic
    accurate_line_search: bool = False
    # Plain --local_only (NOT --minimize): the reference keeps the fast
    # line search and the (25+natoms)/3 iteration heuristic instead of
    # --minimize's 10000-iter accurate-line-search defaults
    # (main.cpp:1152-1166 sets those only under dominimize)
    local_only: bool = False
    # --minimize_early_term (main.cpp:966-969): stop minimization before
    # convergence on a simple progress heuristic (bfgs.h early_term)
    minimize_early_term: bool = False
    # --simple_ascent (main.cpp:1189-1191): legacy adaptive steepest
    # descent (ops/ssd.py) instead of BFGS
    simple_ascent: bool = False
    # --minimize_single_full (main.cpp:987): one full-v minimization per
    # MC step instead of hunt-cap pre-evaluate + full-v refine
    minimize_single_full: bool = False
    cnn_scoring: str = "rescore"   # none|rescore|refinement|all
    cnn_rotations: int = 0
    # CNN/empirical mixing in the CNN minimization objective
    # (non_cache_cnn.cpp:115-167, flags at main.cpp:1023-1030)
    cnn_mix_emp_force: bool = False
    cnn_mix_emp_energy: bool = False
    cnn_empirical_weight: float = 1.0
    sort_order: str = "auto"       # auto|CNNscore|CNNaffinity|Energy
    mc_chunk_steps: int = 256      # steps per device program execution
    search_grid: bool = True       # MC search on precomputed cache grids
                                   # (the reference's default, cache.cpp)
    # Fused Pallas search path (ops/pallas_dock.py): the whole per-step
    # BFGS runs in one Mosaic kernel.  "auto" uses it on TPU for eligible
    # jobs (vina-family SF, ligand-only, CNN not in the search loop);
    # "on" forces it (interpret mode off-TPU: slow, tests only); "off"
    # always uses the XLA path.
    fused_search: str = "auto"
    # Stop each lockstep BFGS once this fraction of the 128 lanes has
    # converged (1.0 = reference-exact: run until every lane converges or
    # maxiters).  Straggler lanes are almost always deep clashes whose
    # poses metropolis rejects; see ROADMAP "Performance plan".
    fused_done_frac: float = 1.0
    # Run the whole MC step loop (mutate + BFGS + metropolis, TPU PRNG)
    # inside the Mosaic kernel, fused_mc_steps steps per invocation; the
    # host folds the streamed candidates into the top-N container with one
    # batched merge per invocation (mc.batch_merge_candidates).  Default ON
    # since round 3: measured A/B at 1024 steps x 128 lanes (10gs) gives
    # equal-or-better wall (22.8 vs 23.8 s) and slightly better poses
    # (mean best -8.43 vs -8.34) than per-step host-driven MC, with ~2x
    # lower compile time.
    fused_mc_in_kernel: bool = True
    # Steps per in-kernel MC invocation (also the full-v refinement
    # cadence of the best accepted candidate in that window).  Larger
    # values amortize kernel-launch + host-merge cost over more steps,
    # refine less often, and — in the async mode — POOL the tick budget
    # across the window so slow steps borrow ticks from fast ones (less
    # tail truncation at a given budget).  Default 128 since round 4:
    # v5e sweep at 1024 steps x 128 lanes (10gs, ROADMAP r4 table) over
    # window {16,64,128,256} x budget {8..32}: S=128 b16 gives ~1.7x the
    # r3 default's throughput at identical mean best (-8.31 vs -8.32)
    # and ~2x lower compile; S=256 adds ~10% more wall but costs ~0.2
    # kcal/mol mean best and 3.6x the compile.  High-torsion packs are
    # scaled down by _async_mc_steps_guard (VMEM).
    fused_mc_steps: int = 128
    # Armijo line-search schedule inside the fused kernel.  The default is
    # the reference-exact schedule (bfgs.h:73-91: 10 halvings to 2^-9) —
    # affordable because the default async MC mode pays only each lane's
    # OWN trial count.  The lockstep fallback (fused_async_* both False)
    # pays the WORST lane's trial count every iteration; for lockstep runs
    # 5 trials at factor 4 (reaching 2^-8) measured 1.65x throughput at
    # statistically equal pose quality — set via GNINA_TPU_FUSED_LS_*.
    fused_ls_trials: int = 10
    fused_ls_factor: float = 2.0
    # Per-lane asynchronous line search inside the fused kernel: every
    # kernel tick is ONE fused value+grad eval with each lane at its own
    # (iteration, trial) state, instead of the lockstep loop where every
    # lane pays the worst lane's Armijo trial count per iteration.
    # Per-lane trajectories (trial points, accepts, Hessian updates) are
    # mathematically identical to the lockstep path (v5e A/B: identical
    # best poses, 1.64x throughput).  Subsumed by fused_async_mc; kept as
    # a fallback for per-step host-driven MC runs.
    fused_async_ls: bool = False
    # Fully per-lane in-kernel MC (requires fused_mc_in_kernel): each lane
    # runs its own (step, iteration, trial) state machine, removing even
    # the per-MC-step BFGS barrier; candidates stream out at completion
    # ticks and the host rebuilds their coordinates with the XLA FK twin.
    # A lane gets at most fused_mc_steps*fused_mc_tick_budget fused evals
    # per window; lanes that exhaust the budget carry their chain state
    # into the next window (slightly fewer mutations for pathological
    # clash lanes — the ones metropolis rejects anyway).  Default ON since
    # round 3: v5e sweep at 1024 steps x 128 lanes (10gs, ROADMAP table)
    # measures 2.38 lig/s at mean best -8.35 vs lockstep 10x2's 0.70 lig/s
    # at -8.43 — 3.4x throughput with quality inside single-seed noise.
    # Budget 16 pooled over the 128-step window (= 2048 ticks) since
    # round 4: quality-gate certified (QUALITY.json, 3 fixtures x 3
    # seeds) at ~1.7x the budget-32/16-step round-3 default.
    fused_async_mc: bool = True
    fused_mc_tick_budget: int = 16
    # Full-v in-loop refine cadence in MC steps, decoupled from the window
    # length (mc_fused refine_subs): the best accepted candidate of every
    # `fused_refine_every` steps is refined at full v and admitted to the
    # top-N container.  0 = auto (max(32, num_steps // 16)).  Near-native
    # basins often carry mediocre hunt-cap energies; without a refined
    # (full-v) version admitted in-loop they can be evicted from the
    # container before the finish stages ever see them — the r5 geometry
    # gate measured 184l rmsd<2A 16/24 at a 32-step cadence vs 8/24 at 64
    # (512-step runs).
    fused_refine_every: int = 0
    # Warm-started per-lane Armijo schedule in async MC: trials begin one
    # notch above the lane's last accepted alpha instead of at 1 every
    # BFGS iteration, reset cold at each new candidate (pallas_dock
    # amc_body).  Measured +2.4% sampling per tick (r5 attrib: 73.1 vs
    # 71.4 steps per 2048-tick window) — not worth a departure from
    # bfgs.h:73's fixed-start schedule as a default.  (The cross-candidate
    # variant bought +29% but FAILED the quality gate: 10gs gap 0.31,
    # geometry 37 vs 39 — recorded in ROADMAP r5.)  Opt-in knob.
    fused_warm_ls: bool = False
    # --outputmin N (main.cpp:1005): write minout.sdf with N interpolated
    # frames per accepted minimization step (bfgs.h:244-310)
    outputmin_frames: int = 0
    # Canonical shape rounding for virtual screens (VERDICT r4 item 7):
    # pad the batch shape key coarsely (atoms to 16, nodes to 8, pairs to
    # 128, receptor rows to 256, BFGS iters to 4) so size-sorted ligand
    # groups and successive receptors reuse one compiled program instead
    # of paying a multi-second trace + cache lookup per shape.  The CLI
    # screen path turns this on; the direct dock_batch API keeps exact
    # rounding (smallest pad = fastest single batch).
    canonical_shapes: bool = False


@dataclasses.dataclass
class PoseResult:
    energy: float               # Vina affinity (kcal/mol)
    intramol: float
    cnnscore: float
    cnnaffinity: float
    cnnvariance: float
    coords: np.ndarray          # (N,3) all-atom coords (unpadded)
    conf_position: np.ndarray
    conf_orientation: np.ndarray
    conf_torsions: np.ndarray
    rmsd: float = -1.0
    within_box: bool = True     # all heavy atoms inside the search box
                                # (the local_only warning, main.cpp:303)


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


def _async_mc_steps_guard(mc_steps: int, m_nodes: int,
                          vmem_cap: int = 10 << 20) -> int:
    """Window-length VMEM guard for the async in-kernel MC: the
    completion-indexed candidate stream holds mc_steps*(11+m) 128-lane
    f32 rows and the BFGS Hessian scratch (7+m)^2 lanes; scale the
    window down (floor 16 steps) so both stay under ~vmem_cap bytes of
    per-core VMEM on high-torsion packs.  Low-torsion ligands keep the
    long default window untouched."""
    lane_bytes = 4 * 128
    fixed = (7 + m_nodes) ** 2 * lane_bytes      # Hessian scratch
    row = (11 + m_nodes) * lane_bytes            # stream rows per step
    budget = max(vmem_cap - fixed, row * 16)
    return int(min(mc_steps, max(budget // row, 16)))


def exact_split(efn, lig_d: LigandData, rec_d: ReceptorData, conf: Conf,
                box: Box, slope, cap):
    """(affinity_arg, intramolecular) decomposition with flex residues —
    reference-exact per model.cu:352-407:
      intramolecular = ligand intra pairs (v[0]) + flex-rigid inter (v[1])
                       + flex-flex other pairs (v[2])
      affinity_arg   = ligand-rigid inter + ligand-flex other pairs
    curl is per atom/pair, so the inter split by atom subset is exact."""
    inter_all = efn.eval_inter(lig_d, rec_d, conf, box, slope, cap[1])
    lig_only = lig_d._replace(heavy_mask=lig_d.lig_heavy_mask)
    inter_lig = efn.eval_inter(lig_only, rec_d, conf, box, slope, cap[1])
    intra = efn.eval_intra(lig_d, conf, cap[0])
    other_all = efn.eval_other(lig_d, conf, cap[2])
    ffl = lig_d._replace(opair_mask=lig_d.opair_mask & lig_d.opair_ff)
    other_ff = efn.eval_other(ffl, conf, cap[2])
    affinity_arg = inter_lig + (other_all - other_ff)
    intramol = intra + (inter_all - inter_lig) + other_ff
    return affinity_arg, intramol


def _num_steps_heuristic(lig: LigandStruct, settings: DockSettings) -> int:
    """main.cpp:449-456."""
    dof = 6 + lig.num_torsions
    heuristic = lig.num_atoms + 10 * dof
    steps = int(70 * 3 * (50 + heuristic) / 2)
    if settings.num_mc_steps > 0:
        steps = settings.num_mc_steps
    if settings.max_mc_steps > 0:
        steps = min(steps, settings.max_mc_steps)
    return steps


def _minimize_iters_heuristic(lig: LigandStruct, settings: DockSettings) -> int:
    """ssd_par.evals = (25 + natoms)/3 (main.cpp:454)."""
    if settings.minimize_iters > 0:
        return settings.minimize_iters
    return max(int((25 + lig.num_atoms) / 3), 1)


def _sf_fingerprint(sf: ScoringFunction):
    """Hashable identity of a scoring function for the program cache: the
    term set, weights, and atom-parameter table fully determine the traced
    computation (all molecule/receptor data flows through program args)."""
    tb = sf.table
    table_h = hash((tb.xs_radius.tobytes(), tb.ad_radius.tobytes(),
                    tb.ad_depth.tobytes(), tb.ad_solvation.tobytes(),
                    tb.ad_volume.tobytes(), tb.xs_hydrophobe.tobytes(),
                    tb.xs_donor.tobytes(), tb.xs_acceptor.tobytes(),
                    tb.ad_heteroatom.tobytes()))
    return (sf.name, tuple(repr(t) for t in sf.pair_terms), sf.pair_weights,
            tuple(repr(t) for t in sf.conf_terms), sf.conf_weights, table_h)


# Process-global compiled-program cache.  The per-engine cache made every
# CLI invocation (and every DockingEngine) re-trace + re-lower each shape
# bucket's Mosaic kernel — seconds per program even with the persistent
# XLA cache hitting.  Programs capture only (settings, scoring function)
# statics; ligand/receptor/box data are runtime args, so sharing across
# engines keyed on those statics is sound.  (VERDICT r4 items 2/7.)
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_LOCK = threading.Lock()


class DockingEngine:
    """Builds and caches jitted docking programs per (shape bucket, box)."""

    def __init__(self, settings: DockSettings = DockSettings(),
                 sf: Optional[ScoringFunction] = None, cnn_scorer=None,
                 user_grid=None):
        self.settings = settings
        self.sf = sf if sf is not None else get_scoring_function(settings.scoring)
        self.cnn = cnn_scorer
        self.user_grid = user_grid  # ops.user_grid.UserGrid bias (--user_grid)
        # jitted dock programs keyed by static config; shared process-wide
        # when nothing engine-local is captured (a user grid is baked into
        # the energy fn via make_energy_fn, so it pins a private cache)
        if user_grid is None:
            # seed is a RUNTIME arg of every program (PRNGKey fed to
            # init_fn / fold_in per chunk) — two engines differing only in
            # seed share identical compiled programs.  Keying on it made
            # every per-seed engine (quality gate, probes, API users who
            # construct one engine per job) re-pay ~40-60 s of
            # trace+lowering per shape even with the persistent XLA cache
            # hitting (r5 finding).
            ck = ("progs-v1",
                  dataclasses.astuple(
                      dataclasses.replace(self.settings, seed=0)),
                  _sf_fingerprint(self.sf))
            with _PROGRAM_CACHE_LOCK:
                self._programs = _PROGRAM_CACHE.setdefault(ck, {})
        else:
            self._programs = {}
        # serializes program BUILDS per prog_key so two screen worker
        # threads that land on the same canonical shape don't trace the
        # same kernel twice (distinct keys still build concurrently)
        self._build_locks = {}
        self._build_locks_guard = threading.Lock()
        # optional search progress sink (the reference's parallel_progress
        # bar, parallel_progress.h); the CLI wires this at --verbosity >= 2
        self.progress = None  # Callable[[str], None] | None

    def _make_efn(self, max_layers: int):
        return make_energy_fn(self.sf, max_layers, user_grid=self.user_grid)

    # -- padding ------------------------------------------------------------

    def _pad_sizes(self, lig: LigandStruct, rec_n: int):
        n = _round_up(lig.num_atoms, 8)
        m = _round_up(lig.num_nodes, 4)
        p = _round_up(max(len(lig.pairs), 1), 32)
        k = _round_up(rec_n, 128)
        return n, m, p, k

    def _prepare(self, rec: Receptor, lig: LigandStruct,
                 center, size) -> Tuple[LigandData, ReceptorData, Box, int, int]:
        pruned = rec.pruned(np.asarray(center), np.asarray(size) / 2,
                            margin=self.sf.cutoff)
        n, m, p, k = self._pad_sizes(lig, len(pruned.types))
        lig_d = pad_ligand(lig, n, m, p)  # q auto-sized per ligand
        rec_d = pad_receptor(pruned.coords, pruned.types, pruned.charges, k)
        lo, hi = box_from_center_size(center, size)
        box = Box(lo=jnp.asarray(lo), hi=jnp.asarray(hi))
        max_layers = int(lig.layer.max()) if lig.num_nodes > 1 else 1
        max_layers = _round_up(max_layers, 4)
        return lig_d, rec_d, box, max_layers, n

    # -- score-only ---------------------------------------------------------

    def score_only(self, rec: Receptor, lig: LigandStruct) -> PoseResult:
        """--score_only (main.cpp:233-270): exact scoring at the input pose."""
        center = lig.orig_coords.mean(axis=0)
        size = np.full(3, 2 * (self.sf.cutoff + lig.max_span()), np.float32)
        lig_d, rec_d, box, max_layers, _ = self._prepare(rec, lig, center, size)
        efn = self._make_efn(max_layers)
        t = lig.num_torsions
        conf = initial_conf(lig, lig_d.num_torsion_slots)
        v = jnp.full((3,), self.settings.forcecap, jnp.float32)

        @jax.jit
        def program(lig_d, rec_d, conf):
            # naive (no box penalty): use an enormous box
            big = Box(lo=jnp.full(3, -1e8), hi=jnp.full(3, 1e8))
            return exact_split(efn, lig_d, rec_d, conf, big, 0.0, v)

        inter, intra = program(lig_d, rec_d, conf)
        e = self._conf_independent(lig, float(inter))
        coords = np.asarray(fk.fk_coords(lig_d, conf, max_layers))[:lig.num_atoms]
        cnnscore, cnnaff, cnnvar = self._cnn_score(rec, lig, coords)
        return PoseResult(energy=e, intramol=float(intra), cnnscore=cnnscore,
                          cnnaffinity=cnnaff, cnnvariance=cnnvar,
                          coords=coords,
                          conf_position=np.asarray(conf.position),
                          conf_orientation=np.asarray(conf.orientation),
                          conf_torsions=np.asarray(conf.torsions)[:t])

    def term_values(self, rec: Receptor, lig: LigandStruct) -> List[float]:
        """Per-term unweighted rec-lig sums at the input pose — the
        "Term values, before weighting" row of --score_only
        (main.cpp:252-264, terms.h evale_robust)."""
        center = lig.orig_coords.mean(axis=0)
        size = np.full(3, 2 * (self.sf.cutoff + lig.max_span()), np.float32)
        pruned = rec.pruned(np.asarray(center), np.asarray(size) / 2,
                            margin=self.sf.cutoff)
        from gnina_tpu.scoring.terms import gather_type_params

        lc = lig.orig_coords
        heavy = ~np.asarray([t in (0, 1) for t in lig.types])
        diff = lc[:, None, :] - pruned.coords[None, :, :]
        r = np.sqrt((diff ** 2).sum(-1))
        within = r < self.sf.cutoff
        pa = gather_type_params(self.sf.table, lig.types)
        pb = gather_type_params(self.sf.table, pruned.types)
        pa = {k: np.asarray(v)[:, None] for k, v in pa.items()}
        pb = {k: np.asarray(v)[None, :] for k, v in pb.items()}
        qa = lig.charges[:, None]
        qb = pruned.charges[None, :]
        vals = []
        for t in self.sf.pair_terms:
            e = np.asarray(t.eval(pa, pb, np.asarray(r, np.float32),
                                  qa=qa, qb=qb))
            mask = within & heavy[:, None] & ~np.asarray(
                [tt in (0, 1) for tt in pruned.types])[None, :]
            vals.append(float(np.where(mask, e, 0.0).sum()))
        return vals

    def _conf_independent(self, lig: LigandStruct, e: float) -> float:
        inputs = {
            "num_tors": np.float32(lig.num_tors),
            "num_heavy_atoms": np.float32(lig.num_heavy_atoms),
            "num_hydrophobic_atoms": np.float32(lig.num_hydrophobic_atoms),
            "ligand_lengths_sum": np.float32(lig.ligand_length),
            "num_ligands": np.float32(1.0),
        }
        return float(np.asarray(self.sf.conf_independent(inputs, np.float32(e))))

    def _cnn_score(self, rec: Receptor, lig: LigandStruct, coords: np.ndarray):
        if self.cnn is None or self.settings.cnn_scoring == "none":
            return 0.0, 0.0, 0.0
        return self.cnn.score_pose(rec, lig, coords)

    # -- local minimization (--minimize / --local_only) -----------------------

    def minimize(self, rec: Receptor, lig: LigandStruct,
                 center=None, size=None) -> PoseResult:
        """--minimize / --local_only refinement from the input pose
        (main.cpp:271-311).  Both modes derive the box from the movable
        atoms (main.cpp:1465-1478); they differ in minimizer defaults:
        --minimize converges (10000 accurate-line-search iters), plain
        --local_only uses the fast line search and the (25+natoms)/3
        heuristic (settings.local_only)."""
        if center is None:
            # movable_atoms_box with autobox_add margin (main.cpp:1465-1478)
            lo = lig.orig_coords.min(axis=0) - self.settings.autobox_add
            hi = lig.orig_coords.max(axis=0) + self.settings.autobox_add
            center, size = (lo + hi) / 2, hi - lo
        lig_d, rec_d, box, max_layers, _ = self._prepare(rec, lig, center, size)
        efn = self._make_efn(max_layers)
        t = lig.num_torsions
        tp = lig_d.num_torsion_slots
        conf0 = initial_conf(lig, tp)
        dof_mask = (jnp.arange(6 + tp) < 6 + t) \
            & (jnp.arange(6 + tp) >= (0 if lig.has_rigid_dof else 6))
        cap = jnp.full((3,), self.settings.forcecap, jnp.float32)
        if self.settings.local_only:
            iters = (self.settings.minimize_iters
                     if self.settings.minimize_iters > 0
                     else _minimize_iters_heuristic(lig, self.settings))
            ls_type = ("accurate" if self.settings.accurate_line_search
                       else "fast")
        else:
            iters = (self.settings.minimize_iters
                     if self.settings.minimize_iters > 0 else 10000)
            ls_type = "accurate"
        if self.settings.simple_ascent:
            ls_type = "simple"   # main.cpp:1189-1191
        iters = min(iters, 10000)
        minpar = MinimizeParams(maxiters=iters, type=ls_type,
                                early_term=self.settings.minimize_early_term)

        use_cnn_refine = (self.cnn is not None and self.settings.cnn_scoring
                          in ("refinement", "metrorefine", "all"))
        cnn_obj = (self._build_cnn_objective(rec, box, max_layers)
                   if use_cnn_refine else None)
        refine = self._build_refine(efn, minpar, cap)

        @jax.jit
        def program(lig_d, rec_d, conf):
            if use_cnn_refine:
                conf = self._cnn_refine(cnn_obj, lig_d, conf, box, minpar,
                                        max_layers)
            else:
                conf, _e = refine(lig_d, rec_d, conf, box)
            big = Box(lo=jnp.full(3, -1e8), hi=jnp.full(3, 1e8))
            inter, intra = exact_split(efn, lig_d, rec_d, conf, big, 0.0,
                                       cap)
            coords = fk.fk_coords(lig_d, conf, max_layers)
            return conf, inter, intra, coords

        conf, inter, intra, coords = program(lig_d, rec_d, conf0)
        coords = np.asarray(coords)[:lig.num_atoms]
        e = self._conf_independent(lig, float(inter))
        heavy = np.asarray(lig_d.heavy_mask)[:lig.num_atoms]
        rmsd = float(np.sqrt(((coords[heavy] - lig.orig_coords[heavy]) ** 2)
                             .sum(axis=1).mean()))
        lo_b, hi_b = np.asarray(box.lo), np.asarray(box.hi)
        within = bool(np.all((coords[heavy] >= lo_b - 1e-4)
                             & (coords[heavy] <= hi_b + 1e-4)))
        cnnscore, cnnaff, cnnvar = self._cnn_score(rec, lig, coords)
        return PoseResult(energy=e, intramol=float(intra), cnnscore=cnnscore,
                          cnnaffinity=cnnaff, cnnvariance=cnnvar, coords=coords,
                          conf_position=np.asarray(conf.position),
                          conf_orientation=np.asarray(conf.orientation),
                          conf_torsions=np.asarray(conf.torsions)[:t],
                          rmsd=rmsd, within_box=within)

    def minimize_trajectory(self, rec: Receptor, lig: LigandStruct,
                            center=None, size=None) -> "np.ndarray":
        """--outputmin N (main.cpp:1005, bfgs.h:244-310): all-atom frames
        of the minimization trajectory, N+1 interpolated frames per
        accepted quasi-Newton step (factor 0..1 inclusive, bfgs.h:302-310).

        Captures the slope=10 quasi-Newton run (refine_structure's first
        escalation, main.cpp:131-173) — for in-box input poses that is the
        run whose minout.sdf survives in the reference (each escalation
        reopens/truncates the file).  Returns (F, num_atoms, 3) float32.
        """
        from gnina_tpu.ops import quat as Q
        from gnina_tpu.ops.bfgs import bfgs as _bfgs

        nframes = self.settings.outputmin_frames
        if center is None:
            lo = lig.orig_coords.min(axis=0) - self.settings.autobox_add
            hi = lig.orig_coords.max(axis=0) + self.settings.autobox_add
            center, size = (lo + hi) / 2, hi - lo
        lig_d, rec_d, box, max_layers, _ = self._prepare(rec, lig, center,
                                                         size)
        efn = self._make_efn(max_layers)
        t = lig.num_torsions
        tp = lig_d.num_torsion_slots
        conf0 = initial_conf(lig, tp)
        cap = jnp.full((3,), self.settings.forcecap, jnp.float32)
        if self.settings.local_only:
            iters = (self.settings.minimize_iters
                     if self.settings.minimize_iters > 0
                     else _minimize_iters_heuristic(lig, self.settings))
            ls_type = ("accurate" if self.settings.accurate_line_search
                       else "fast")
        else:
            iters = (self.settings.minimize_iters
                     if self.settings.minimize_iters > 0 else 10000)
            ls_type = "accurate"
        minpar = MinimizeParams(maxiters=min(iters, 10000), type=ls_type,
                                early_term=self.settings.minimize_early_term)
        traj_cap = min(minpar.maxiters, 128)
        factors = (jnp.arange(nframes + 1, dtype=jnp.float32)
                   / max(nframes, 1))

        @jax.jit
        def program(lig_d, rec_d, conf0):
            slope = 10.0

            def f(c):
                return efn.eval_deriv(lig_d, rec_d, c, box, slope, cap)

            def fv(c):
                return efn.eval_energy(lig_d, rec_d, c, box, slope, cap)

            _res, hist, n = _bfgs(f, conf0, minpar, f_val=fv,
                                  traj_cap=traj_cap)

            def pair_frames(row0, row1):
                q0, q1 = row0[3:7], row1[3:7]
                v = Q.quaternion_to_rotvec(Q.qmul(q1, Q.qconj(q0)))
                dt = Q.normalize_angle(row1[7:] - row0[7:])

                def at(fac):
                    c = Conf(
                        position=row0[:3] + fac * (row1[:3] - row0[:3]),
                        orientation=Q.qnormalize_approx(
                            Q.qmul(Q.rotvec_to_quaternion(fac * v), q0)),
                        torsions=Q.normalize_angle(row0[7:] + fac * dt))
                    return fk.fk_coords(lig_d, c, max_layers)

                return jax.vmap(at)(factors)

            coords = jax.vmap(pair_frames)(hist[:-1], hist[1:])
            return coords, n

        coords, n = program(lig_d, rec_d, conf0)
        n = int(n)
        out = np.asarray(coords)[:n].reshape(-1, coords.shape[-2], 3)
        return out[:, :lig.num_atoms]

    def _build_refine(self, efn, minpar: MinimizeParams, cap):
        """refine_structure (main.cpp:131-173): up to 5 slope escalations."""

        def refine(lig_d, rec_d, conf, box):
            dof = 6 + lig_d.num_torsion_slots

            def within(conf):
                coords = fk.fk_coords(lig_d, conf, efn.max_layers)
                margin = 0.0001
                ok = jnp.logical_and(coords >= box.lo - margin,
                                     coords <= box.hi + margin)
                ok = jnp.logical_or(ok, ~lig_d.heavy_mask[:, None])
                return jnp.all(ok)

            def body(i, state):
                conf, e, done = state
                slope = 10.0 ** (i + 1.0)

                def f(c):
                    return efn.eval_deriv(lig_d, rec_d, c, box, slope, cap)

                def fv(c):
                    return efn.eval_energy(lig_d, rec_d, c, box, slope, cap)

                res = bfgs(f, conf, minpar, f_val=fv)
                new_done = within(res.x)
                conf2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(done, old, new), res.x, conf)
                e2 = jnp.where(done, e, res.f0)
                return conf2, e2, jnp.logical_or(done, new_done)

            conf, e, done = jax.lax.fori_loop(
                0, 5, body, (conf, jnp.float32(MAX_FL), jnp.asarray(False)))
            e = jnp.where(done, e, jnp.float32(MAX_FL))
            return conf, e

        return refine

    # -- CNN objective (non_cache_cnn equivalent) ------------------------------

    def _build_cnn_objective(self, rec: Receptor, box: Box, max_layers: int):
        """CNN loss + out-of-bounds penalties as a differentiable objective
        (reference: non_cache_cnn.cpp:33-169).

        Ligand-GENERIC: every function takes the (traced) LigandData as its
        first argument, so one bound objective serves a whole shape bucket
        and vmaps over the ligand axis of a refinement screen (round-2
        bound the objective per ligand and docked batch-of-one).

        Returns dict with:
          value(lig_d, conf, center, slope) -> loss + penalties
          deriv(lig_d, conf, center, slope) -> (value, grad over DOF)
          center_of(lig_d, conf) -> heavy centroid (set_center_from_model)
          value_on_coords(lig_d, coords, slope) -> metropolis energy
        """
        margin = self.cnn.max_dimension / 2 + 6.0
        lo = np.asarray(box.lo) - margin
        hi = np.asarray(box.hi) + margin
        keep = np.all((rec.coords >= lo) & (rec.coords <= hi), axis=1)
        k = _round_up(int(keep.sum()), 256)
        pad = k - int(keep.sum())
        rc = np.pad(rec.coords[keep], ((0, pad), (0, 0)))
        rt = np.pad(rec.types[keep], (0, pad))
        rm = np.pad(np.ones(int(keep.sum()), bool), (0, pad))
        prep_fn, loss_from_grids = self.cnn.make_loss_fn_split(rc, rt, rm)
        half_dim = self.cnn.max_dimension / 2.0

        # CNN/empirical mixing (non_cache_cnn.cpp:115-167): blend the
        # empirical inter energy/forces into the minimization objective.
        # mix_emp_force mixes only the gradient (value stays pure CNN),
        # mix_emp_energy only the value — reproduced with stop_gradient.
        # Metropolis (value_on_coords) stays pure CNN: the reference's
        # eval() has no mixing (non_cache_cnn.cpp:33-54).
        s = self.settings
        mix_f = bool(getattr(s, "cnn_mix_emp_force", False))
        mix_e = bool(getattr(s, "cnn_mix_emp_energy", False))
        emp_w = float(getattr(s, "cnn_empirical_weight", 1.0))
        emp_value = None
        if mix_f or mix_e:
            efn = self._make_efn(max_layers)
            center_b = np.asarray(box.lo + box.hi) / 2
            half_b = np.asarray(box.hi - box.lo) / 2
            pruned = rec.pruned(center_b, half_b, margin=self.sf.cutoff)
            kk = _round_up(len(pruned.types), 128)
            emp_rec_d = pad_receptor(pruned.coords, pruned.types,
                                     pruned.charges, kk)
            v_emp = jnp.float32(self.settings.forcecap)

            def emp_value(lig_d, coords, slope):
                # rec-lig pairwise at box-clamped coords + slope penalty
                # (the emp branch of non_cache_cnn::eval_deriv, :117-137)
                return efn.inter_on_coords(lig_d, emp_rec_d, coords, box,
                                           slope, v_emp)

        def _mix(cnn_val, emp_val):
            mixed = (cnn_val + emp_w * emp_val) / (1.0 + emp_w)
            if mix_f and mix_e:
                return mixed
            if mix_f:    # gradient mixed, value pure CNN
                return mixed + jax.lax.stop_gradient(cnn_val - mixed)
            if mix_e:    # value mixed, gradient pure CNN
                return cnn_val + jax.lax.stop_gradient(mixed - cnn_val)
            return cnn_val

        def center_of(lig_d: LigandData, conf: Conf):
            coords = fk.fk_coords(lig_d, conf, max_layers)
            cnt = jnp.maximum(jnp.sum(lig_d.heavy_mask), 1)
            return jnp.sum(jnp.where(lig_d.heavy_mask[:, None], coords, 0.0),
                           axis=0) / cnt

        def prep(center):
            """Receptor density grids at a fixed center — loop-invariant
            for a whole BFGS refinement (non_cache_cnn::adjust_center is
            called once at minimization start).  Always differentiation-
            free: the receptor is rigid, so these grids carry no pose
            gradient."""
            return jax.lax.stop_gradient(
                prep_fn(jax.lax.stop_gradient(center)))

        def value_p(rec_grids, lig_d: LigandData, conf: Conf, center, slope):
            coords = fk.fk_coords(lig_d, conf, max_layers)
            # search-box + cnn-box linear penalties per heavy atom
            def oob(lo_, hi_):
                adj = jnp.clip(coords, lo_, hi_)
                d = jnp.sum(jnp.abs(coords - adj), axis=-1)
                return jnp.sum(jnp.where(lig_d.heavy_mask, d, 0.0))

            pen = slope * (oob(box.lo, box.hi)
                           + oob(center - half_dim, center + half_dim))
            cnn_val = loss_from_grids(rec_grids, coords, lig_d.types,
                                      lig_d.atom_mask, center) + pen
            if emp_value is None:
                return cnn_val
            return _mix(cnn_val, emp_value(lig_d, coords, slope))

        def deriv_p(rec_grids, lig_d: LigandData, conf: Conf, center, slope):
            t = conf.torsions.shape[-1]

            def f(eps):
                return value_p(rec_grids, lig_d,
                               fk.conf_with_increment_var(conf, eps),
                               center, slope)

            return jax.value_and_grad(f)(jnp.zeros((6 + t,), jnp.float32))

        def value(lig_d: LigandData, conf: Conf, center, slope):
            return value_p(prep(center), lig_d, conf, center, slope)

        def deriv(lig_d: LigandData, conf: Conf, center, slope):
            return deriv_p(prep(center), lig_d, conf, center, slope)

        def value_on_coords(lig_d: LigandData, coords, slope):
            """CNN metropolis energy from precomputed lab coords (the MC
            step already has them; center = heavy centroid per call, like
            DLScorer::setCenter)."""
            cnt = jnp.maximum(jnp.sum(lig_d.heavy_mask), 1)
            center = jnp.sum(
                jnp.where(lig_d.heavy_mask[:, None], coords, 0.0),
                axis=0) / cnt

            def oob(lo_, hi_):
                adj = jnp.clip(coords, lo_, hi_)
                d = jnp.sum(jnp.abs(coords - adj), axis=-1)
                return jnp.sum(jnp.where(lig_d.heavy_mask, d, 0.0))

            pen = slope * (oob(box.lo, box.hi)
                           + oob(center - half_dim, center + half_dim))
            return loss_from_grids(prep(center), coords, lig_d.types,
                                   lig_d.atom_mask, center) + pen

        return {"value": value, "deriv": deriv, "center_of": center_of,
                "value_on_coords": value_on_coords, "prep": prep,
                "value_p": value_p, "deriv_p": deriv_p}

    # -- randomize only -------------------------------------------------------

    def randomize(self, rec: Receptor, lig: LigandStruct, center, size,
                  seed: int = 0, attempts: int = 100) -> PoseResult:
        """--randomize_only (main.cpp:100-129): random conf minimizing the
        pairwise clash penalty over `attempts` tries."""
        lig_d, rec_d, box, max_layers, _ = self._prepare(rec, lig, center, size)
        tp = lig_d.num_torsion_slots
        cov = jnp.asarray(self.sf.table.covalent_radius)[lig_d.types]

        def clash_penalty(conf):
            """model.cpp:1173-1201: 1 - (r/cov_r)^2/4 capped at 0 beyond 2x."""
            coords = fk.fk_coords(lig_d, conf, max_layers)
            ca = coords[lig_d.pair_a]
            cb = coords[lig_d.pair_b]
            r = jnp.sqrt(jnp.maximum(
                jnp.sum((ca - cb) ** 2, axis=-1), 1e-12))
            cr = cov[lig_d.pair_a] + cov[lig_d.pair_b]
            x = r / jnp.maximum(cr, 1e-6)
            pen = jnp.where(x > 2.0, 0.0, 1.0 - x * x / 4.0)
            return jnp.sum(jnp.where(lig_d.pair_mask, pen, 0.0))

        @jax.jit
        def program(key):
            keys = jax.random.split(key, attempts)
            confs = jax.vmap(lambda k: mc.randomize_conf(
                k, lig_d, box.lo, box.hi, tp))(keys)
            pens = jax.vmap(clash_penalty)(confs)
            best = jnp.argmin(pens)
            return jax.tree_util.tree_map(lambda a: a[best], confs), pens[best]

        conf, pen = program(jax.random.PRNGKey(seed))
        coords = np.asarray(fk.fk_coords(lig_d, conf, max_layers))[:lig.num_atoms]
        return PoseResult(energy=float(pen), intramol=0.0, cnnscore=-1.0,
                          cnnaffinity=0.0, cnnvariance=0.0, coords=coords,
                          conf_position=np.asarray(conf.position),
                          conf_orientation=np.asarray(conf.orientation),
                          conf_torsions=np.asarray(conf.torsions)[:lig.num_torsions])

    # -- full docking ---------------------------------------------------------

    def dock(self, rec: Receptor, lig: LigandStruct, center, size,
             seed: Optional[int] = None) -> List[PoseResult]:
        return self.dock_batch(rec, [lig], center, size, seed=seed)[0]

    def dock_batch(self, rec: Receptor, ligs: List[LigandStruct], center,
                   size, seed: Optional[int] = None,
                   mesh=None) -> List[List[PoseResult]]:
        """Dock a batch of ligands against one receptor/box in ONE compiled
        program: (ligands x exhaustiveness) MC chains run as a single 2D
        batch on the accelerator.  This is the throughput path — the
        reference's ligand work-queue + thread pool (main.cpp:1418-1510)
        collapses into a batch dimension.

        All ligands share the MC step count (max of the per-ligand
        heuristics, main.cpp:449-456) so the batch stays rectangular.

        mesh: optional jax.sharding.Mesh with a "dp" axis.  The ligand axis
        of the batch is sharded over it (the docking inner loop needs no
        collectives — the reference's thread-level parallel_mc.cpp:183-214
        becomes pure SPMD data parallelism over ICI).  The batch is padded
        to a multiple of the axis size; padded results are dropped.
        """
        s = self.settings
        assert ligs, "empty ligand batch"
        n_real = len(ligs)
        if mesh is not None:
            dp = mesh.shape["dp"]
            ligs = ligs + [ligs[-1]] * ((-len(ligs)) % dp)

        # common shape bucket; canonical_shapes rounds coarsely so screen
        # groups / successive receptors hit one compiled program
        rn, rm, rp, rk = (16, 8, 128, 256) if s.canonical_shapes \
            else (8, 4, 32, 128)
        n = _round_up(max(l.num_atoms for l in ligs), rn)
        m = _round_up(max(l.num_nodes for l in ligs), rm)
        p = _round_up(max(max(len(l.pairs) for l in ligs), 1), rp)
        max_layers = _round_up(max(int(l.layer.max()) if l.num_nodes > 1 else 1
                                   for l in ligs), 4)
        pruned = rec.pruned(np.asarray(center), np.asarray(size) / 2,
                            margin=self.sf.cutoff)
        k = _round_up(len(pruned.types), rk)
        rec_d = pad_receptor(pruned.coords, pruned.types, pruned.charges, k)
        lo, hi = box_from_center_size(center, size)
        box = Box(lo=jnp.asarray(lo), hi=jnp.asarray(hi))

        q = _round_up(max((len(l.other_pairs) if l.other_pairs is not None
                           else 0) for l in ligs), 32)
        lig_ds = [pad_ligand(l, n, m, p, q_pad=q) for l in ligs]
        lig_batch = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *lig_ds)
        tp = m - 1
        dof_masks = jnp.stack([
            (jnp.arange(6 + tp) < 6 + l.num_torsions)
            & (jnp.arange(6 + tp) >= (0 if l.has_rigid_dof else 6))
            for l in ligs])
        num_tors_b = jnp.asarray([l.num_torsions for l in ligs], jnp.int32)
        rigid_b = jnp.asarray([l.has_rigid_dof for l in ligs], bool)

        num_steps = max(_num_steps_heuristic(l, s) for l in ligs)
        miniters = max(_minimize_iters_heuristic(l, s) for l in ligs)
        if s.canonical_shapes:
            # miniters feeds the program key; round it up so groups with
            # nearby atom counts share a program (a few extra BFGS iters
            # are cheap — early termination already bounds the work)
            miniters = _round_up(miniters, 4)

        fused_pack = fused_meta = fused_pack_out = fused_meta_out = None
        if self._fused_eligible(ligs):
            from gnina_tpu.ops import mc_fused, pallas_dock as pdk

            # under a mesh the lane axis is laid out per shard (each dp
            # shard gets a self-contained [real | pad] lane block) and the
            # kernel runs inside shard_map — see _build_dock_program
            dp = mesh.shape["dp"] if mesh is not None else 1
            # receptor arrays padded host-side (rec_d lives on the device;
            # reading it back would round-trip the accelerator tunnel)
            kr = len(pruned.types)
            rc = np.zeros((k, 3), np.float32)
            rc[:kr] = pruned.coords
            rt = np.zeros((k,), np.int32)
            rt[:kr] = pruned.types
            rq = np.zeros((k,), np.float32)
            rq[:kr] = pruned.charges
            rm = np.zeros((k,), np.float32)
            rm[:kr] = 1.0
            fused_pack = pdk.build_pack(
                ligs, rc, rt, rq, rm,
                s.exhaustiveness, self.sf.table, m_pad=m, shards=dp)
            fused_meta = mc_fused.lane_meta(ligs, s.exhaustiveness,
                                            fused_pack, n)
            # second lane layout for the finish-phase refinement: one lane
            # per saved pose (ligand x num_out) instead of per chain
            num_out = max(s.num_modes, s.num_mc_saved)
            fused_pack_out = pdk.build_pack(
                ligs, rc, rt, rq, rm, num_out, self.sf.table, m_pad=m,
                shards=dp)
            fused_meta_out = mc_fused.lane_meta(ligs, num_out,
                                                fused_pack_out, n)

        grids = None
        if s.search_grid and fused_pack is None:
            grids = self._populate_cache(ligs, rec_d, lo, hi)
        out = self._run_dock_program(
            rec, ligs, lig_batch, dof_masks, num_tors_b, rec_d, box,
            max_layers, num_steps, miniters, seed, grids, mesh=mesh,
            rigid_b=rigid_b, fused_pack=fused_pack, fused_meta=fused_meta,
            fused_pack_out=fused_pack_out, fused_meta_out=fused_meta_out)
        return out[:n_real]

    def _fused_eligible(self, ligs) -> bool:
        """The fused Pallas search covers: vina-family scoring, ligand-only
        (no flex residues), CNN out of the search loop, no user grids.
        Everything else takes the general XLA path."""
        s = self.settings
        if s.fused_search == "off":
            return False
        if s.fused_search != "on" and jax.default_backend() not in (
                "tpu", "axon"):
            return False  # interpret mode is for tests only
        from gnina_tpu.ops.pallas_dock import extract_vina_terms

        if extract_vina_terms(self.sf) is None:
            return False
        if self.user_grid is not None:
            return False
        if self.cnn is not None and s.cnn_scoring not in ("none", "rescore"):
            return False
        if s.simple_ascent or s.minimize_single_full:
            return False  # hidden testing minimizer variants: XLA path
        for l in ligs:
            if l.num_lig_atoms not in (-1, l.num_atoms):
                return False  # flex residues attached
            if l.other_pairs is not None and len(l.other_pairs):
                return False
        return True

    def _populate_cache(self, ligs, rec_d, lo, hi, num_slots: int = 16):
        """Build the per-type search grids for this receptor/box
        (cache::populate, cache.cpp:104-184), shared by the ligand batch."""
        types = sorted({int(t) for l in ligs for t in l.types
                        if int(t) > 1})  # movable non-hydrogen types
        if len(types) > num_slots:
            return None  # fall back to analytic search
        slot_of_type = np.zeros(28, np.int32)
        gridded = np.zeros(28, bool)
        slot_types = np.zeros(num_slots, np.int32)
        for i, t in enumerate(types):
            slot_of_type[t] = i
            gridded[t] = True
            slot_types[i] = t
        npts = cg.grid_shape_for(lo, hi)
        charge_terms = self.sf.has_charge_terms
        key = ("populate", npts, num_slots, rec_d.types.shape[0], charge_terms)
        if key not in self._programs:
            self._programs[key] = jax.jit(cg.make_populate_fn(
                self.sf, npts, num_slots, charge_terms))
        grids = self._programs[key](
            rec_d, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(slot_types),
            jnp.asarray(slot_of_type), jnp.asarray(gridded))
        if self.user_grid is not None:
            # fold the user-grid bias into every type slot (cache.cpp:177)
            from gnina_tpu.ops.user_grid import user_values_on_lattice

            uv = user_values_on_lattice(self.user_grid, np.asarray(lo),
                                        cg.GRANULARITY, npts)
            data = grids.data + jnp.asarray(uv)[None]
            grids = grids._replace(data=data, cells=cg._make_cells(data))
        return grids

    def _run_dock_program(self, rec, ligs, lig_batch, dof_masks, num_tors_b,
                          rec_d, box, max_layers, num_steps, miniters,
                          seed: Optional[int], grids=None, mesh=None,
                          rigid_b=None, fused_pack=None, fused_meta=None,
                          fused_pack_out=None,
                          fused_meta_out=None) -> List[List[PoseResult]]:
        s = self.settings
        num_out = max(s.num_modes, s.num_mc_saved)
        if rigid_b is None:
            rigid_b = jnp.ones((len(ligs),), bool)

        # CNN-in-the-loop modes (user_opts.h:24-31, main_procedure):
        #   refinement/metrorefine/all -> CNN loss refines poses
        #   refinement/metro*/all      -> CNN loss drives metropolis
        #   all                        -> CNN loss is the MC minimization
        #                                 objective too
        mode = s.cnn_scoring
        has_cnn = self.cnn is not None and mode != "none"
        use_cnn_metro = has_cnn and mode in ("refinement", "metrorescore",
                                             "metrorefine", "all")
        use_cnn_refine = has_cnn and mode in ("refinement", "metrorefine", "all")
        use_cnn_search = has_cnn and mode == "all"
        cnn_obj = None
        if use_cnn_metro or use_cnn_refine:
            # ligand-generic objective: binds the receptor/box once per
            # shape bucket and vmaps over the ligand axis (round-2 docked
            # CNN-in-the-loop screens batch-of-one; VERDICT r2 weak #3)
            cnn_obj = self._build_cnn_objective(rec, box, max_layers)

        use_grid_search = grids is not None and not use_cnn_search
        # scale the per-program step chunk down as lane count grows: single
        # device executions must stay well under the tunnel watchdog
        lanes = max(len(ligs) * s.exhaustiveness, 1)
        base_chunk = int(self.settings.mc_chunk_steps) or num_steps
        use_fused = fused_pack is not None
        if use_fused:
            # fused steps are ~10-30x cheaper per lane than the XLA path
            chunk = min(num_steps,
                        max(32, base_chunk * 128 // max(lanes, 128)))
            from gnina_tpu.ops import pallas_dock as pdk

            fdims = pdk._static_dims(fused_pack)
            n_hvy = int((fused_pack.heavy_idx >= 0).sum(axis=1).max())
            dp = mesh.shape["dp"] if mesh is not None else 1
            # The async candidate stream is completion-indexed (one-hot
            # accumulate at the lane's step counter, ops/pallas_dock.py),
            # so its VMEM footprint is mc_steps*(11+m) rows — independent
            # of tick_budget; the guard scales the WINDOW LENGTH down for
            # high-torsion packs instead of the r3 tick-budget guard.
            mcs = 0
            if s.fused_mc_in_kernel:
                mcs = max(int(s.fused_mc_steps) or 16, 1)
                if not s.fused_async_mc and mcs > 16:
                    # the r4 window-length quality sweep (ROADMAP r4
                    # table) certified long windows for the ASYNC mode
                    # only; the lockstep path keeps the r3-certified
                    # 16-step window (ADVICE r4)
                    mcs = 16
                # cap the window at num_steps//8 (floor 16) so SHORT runs
                # keep >=8 windows — at 512 steps a 128-step window
                # measured a 0.35 kcal/mol mean-best loss on 10gs from
                # pooled-budget truncation, while 1024-step runs show none.
                # (Shrinking the window FURTHER to densify the refine
                # cadence was tried and rejected in r5: S=32 at 512 steps
                # recovered 184l pose geometry (16/24 vs 8/24 rmsd<2A) but
                # cost 0.35 kcal/mol mean best on 10gs — short pooled
                # windows truncate high-torsion lanes.  The refine cadence
                # is decoupled below via refine_subs instead.)
                mcs = min(mcs, max(num_steps // 8, 16))
                if s.fused_async_mc:
                    m_nodes = fused_pack.nodeoh.shape[0]
                    guarded = _async_mc_steps_guard(mcs, m_nodes)
                    if guarded < mcs:
                        print(f"gnina_tpu: async MC window {mcs} -> "
                              f"{guarded} steps (VMEM guard, {m_nodes} "
                              "tree nodes)", file=sys.stderr)
                        mcs = guarded
                # the in-kernel MC runs in windows of mcs steps; the
                # chunk must be a whole number of windows or the executed
                # step count silently drifts from the requested one
                chunk = max(((chunk + mcs - 1) // mcs) * mcs, mcs)
            # full-v refine cadence, decoupled from the window length
            # (mc_fused refine_subs): short runs refine relatively more
            # (every max(32, num_steps//16) steps) because the pose-
            # geometry gate showed 184l needs a ~32-step cadence at 512
            # steps, while at default effort (~28.7k steps) extra refine
            # kernel calls would cost ~25% wall for no measured quality
            # gain (ROADMAP r5).
            r_every = int(s.fused_refine_every) or max(32, num_steps // 16)
            refine_subs = max(1, mcs // max(r_every, 1))
            while mcs % refine_subs:
                refine_subs -= 1
            tick_budget = int(s.fused_mc_tick_budget)
            prog_key = ("fused", fdims, n_hvy, chunk, miniters,
                        s.exhaustiveness, num_out, s.fused_done_frac,
                        s.fused_mc_in_kernel, mcs, refine_subs, dp,
                        s.fused_ls_trials, s.fused_ls_factor,
                        s.fused_async_ls, s.fused_async_mc,
                        tick_budget, s.fused_warm_ls)
        else:
            chunk = min(num_steps, max(32, base_chunk * 64 // max(lanes, 64)))
            fdims = None
            prog_key = (max_layers, chunk, miniters, s.exhaustiveness,
                        num_out, mode, has_cnn, use_grid_search)
        if mesh is not None:
            # shard_map closes over the Mesh; key on its device layout so
            # a cached program is only reused for an equivalent mesh
            prog_key = prog_key + (tuple(d.id for d in mesh.devices.flat),
                                   mesh.axis_names)
        # serialize same-key builds (two screen workers on one canonical
        # shape) without serializing distinct-key compiles
        with self._build_locks_guard:
            build_lock = self._build_locks.setdefault(prog_key,
                                                      threading.Lock())
        with build_lock:
            if cnn_obj is None and prog_key in self._programs:
                progs = self._programs[prog_key]
            else:
                fused = fused_out = fused_mc = None
                if use_fused:
                    fused = pdk.FusedBfgs(
                        self.sf, fused_pack, maxiters=miniters,
                        want_metro=True, n_iter=n_hvy,
                        done_frac=s.fused_done_frac, shards=dp,
                        num_trials=s.fused_ls_trials,
                        ls_factor=s.fused_ls_factor,
                        async_ls=s.fused_async_ls)
                    fused_out = pdk.FusedBfgs(
                        self.sf, fused_pack_out, maxiters=miniters,
                        want_metro=False, n_iter=n_hvy,
                        done_frac=s.fused_done_frac, shards=dp,
                        num_trials=s.fused_ls_trials,
                        ls_factor=s.fused_ls_factor,
                        async_ls=s.fused_async_ls)
                    if s.fused_mc_in_kernel:
                        # mcs: the guarded window length from prog_key
                        fused_mc = pdk.FusedBfgs(
                            self.sf, fused_pack, maxiters=miniters,
                            want_metro=True, n_iter=n_hvy,
                            done_frac=s.fused_done_frac, mc_steps=mcs,
                            shards=dp,
                            num_trials=s.fused_ls_trials,
                            ls_factor=s.fused_ls_factor,
                            async_ls=s.fused_async_ls,
                            async_mc=s.fused_async_mc,
                            tick_budget=tick_budget,
                            warm_ls=s.fused_warm_ls)
                progs = self._build_dock_program(
                    max_layers, chunk, miniters, num_out, cnn_obj,
                    use_cnn_metro, use_cnn_refine, use_cnn_search,
                    use_grid_search, fused=fused, fused_out=fused_out,
                    fused_mc=fused_mc, mesh=mesh,
                    refine_subs=refine_subs if use_fused else 1)
                if cnn_obj is None:
                    self._programs[prog_key] = progs

        init_fn, chunk_fn, finish_fn = progs
        base = jax.random.PRNGKey(seed if seed is not None else s.seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(len(ligs)))
        done = 0
        ci = 0
        if grids is None:
            # analytic path still threads a dummy grids pytree
            grids = cg.CacheGrids(
                data=jnp.zeros((1, 1, 1, 1), jnp.float32),
                chargedata=jnp.zeros((1, 1, 1, 1), jnp.float32),
                slot_of_type=jnp.zeros(28, jnp.int32),
                type_gridded=jnp.zeros(28, bool),
                origin=jnp.zeros(3, jnp.float32),
                dims_minus_1=jnp.zeros(3, jnp.float32),
                cells=jnp.zeros((1, 8), jnp.float32),
                ccells=jnp.zeros((1, 8), jnp.float32))
        if mesh is not None:
            # ligand axis over "dp"; receptor/grids replicated.  XLA
            # propagates the shardings through the jitted vmapped programs —
            # no collectives appear (each ligand-chain lane is independent).
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp_sh = NamedSharding(mesh, P("dp"))
            rep_sh = NamedSharding(mesh, P())
            lig_batch = jax.device_put(lig_batch, dp_sh)
            dof_masks = jax.device_put(dof_masks, dp_sh)
            num_tors_b = jax.device_put(num_tors_b, dp_sh)
            rigid_b = jax.device_put(rigid_b, dp_sh)
            keys = jax.device_put(keys, dp_sh)
            rec_d = jax.device_put(rec_d, rep_sh)
            grids = jax.device_put(grids, rep_sh)
        import os as _os
        import time as _time
        _prof = bool(_os.environ.get("GNINA_TPU_PROFILE"))

        def _tick(label, _last=[_time.time()]):
            if _prof:
                now = _time.time()
                print(f"[prof] {label}: {now - _last[0]:.2f}s", flush=True)
                _last[0] = now

        carry = init_fn(lig_batch, box.lo, box.hi, keys)
        if _prof:
            jax.block_until_ready(carry)
        _tick("init")
        while done < num_steps:
            if use_fused:
                ck = jax.random.fold_in(base, 9000 + ci)
                carry = chunk_fn(carry, ck, fused_pack, fused_meta,
                                 box.lo, box.hi)
            else:
                ckeys = jax.vmap(
                    lambda kk: jax.random.fold_in(kk, 1000 + ci))(keys)
                carry = chunk_fn(carry, lig_batch, dof_masks, num_tors_b,
                                 rigid_b, rec_d, grids, box.lo, box.hi, ckeys)
            done += chunk
            ci += 1
            if self.progress is not None:
                self.progress(
                    f"MC {min(done, num_steps)}/{num_steps} steps "
                    f"({len(ligs)} ligand(s) x {s.exhaustiveness} chains)")
            if _prof:
                jax.block_until_ready(carry)
            _tick(f"chunk{ci}")
        merge_fn, stage_fn, rescore_fn = finish_fn
        mconf, mdone, menergy = merge_fn(carry, lig_batch)
        if _prof:
            jax.block_until_ready(mconf)
            print("[prof] cont.e:",
                  np.asarray(carry.cont.energy).reshape(-1)[:16], flush=True)
            print("[prof] menergy:", np.asarray(menergy)[:, :8], flush=True)
        _tick("merge")
        for stage_i in range(5):
            slope_i = jnp.float32(10.0 ** (stage_i + 1))
            if use_fused:
                mconf, mdone = stage_fn(mconf, mdone, fused_pack_out,
                                        fused_meta_out, box.lo, box.hi,
                                        slope_i)
            else:
                mconf, mdone = stage_fn(mconf, mdone, lig_batch, rec_d,
                                        box.lo, box.hi, slope_i)
            if _prof:
                jax.block_until_ready(mconf)
            _tick(f"stage{stage_i}")
        if _prof:
            print("[prof] post-stage pos:", np.asarray(mconf.position)[0, :4],
                  "done:", np.asarray(mdone)[0, :8], flush=True)
        confs, inters, intras, coords = rescore_fn(
            mconf, menergy, lig_batch, rec_d, box.lo, box.hi)
        if _prof:
            jax.block_until_ready(coords)
            print("[prof] inters:", np.asarray(inters)[0, :8], flush=True)
        _tick("rescore")
        inters = np.asarray(inters)     # (L, num_out)
        intras = np.asarray(intras)
        coords = np.asarray(coords)     # (L, num_out, N, 3)
        # one wholesale device->host transfer: per-pose np.asarray slices
        # would each round-trip the accelerator tunnel (~0.25s apiece)
        confs = jax.tree_util.tree_map(np.asarray, confs)
        # conf-independent post-processing for every (ligand, pose) in ONE
        # call: a per-pose _conf_independent would dispatch a device op and
        # round-trip the tunnel for each pose
        ci_in = {
            "num_tors": np.asarray([l.num_tors for l in ligs],
                                   np.float32)[:, None],
            "num_heavy_atoms": np.asarray(
                [l.num_heavy_atoms for l in ligs], np.float32)[:, None],
            "num_hydrophobic_atoms": np.asarray(
                [l.num_hydrophobic_atoms for l in ligs], np.float32)[:, None],
            "ligand_lengths_sum": np.asarray(
                [l.ligand_length for l in ligs], np.float32)[:, None],
            "num_ligands": np.full((len(ligs), 1), 1.0, np.float32),
        }
        energies = np.asarray(self.sf.conf_independent(
            ci_in, inters.astype(np.float32)))      # (L, num_out)
        _tick("fetch")

        # batched CNN rescoring: ONE ensemble forward covers every valid
        # pose of every ligand in the batch (per-pose lig typing in the
        # scorer program) — the per-ligand score_poses loop paid a device
        # dispatch + ~1 s of tunnel transfers per ligand
        valid_by_lig = [[i for i in range(num_out) if inters[li, i] < MAX_FL]
                        for li in range(len(ligs))]
        multi_scores = None
        if has_cnn:
            items = [(lig, np.stack([coords[li, i][:lig.num_atoms]
                                     for i in valid_ids]))
                     for li, (lig, valid_ids)
                     in enumerate(zip(ligs, valid_by_lig)) if valid_ids]
            if items:
                packed = self.cnn.score_poses_multi(rec, items)
                multi_scores = iter(packed)
        all_results: List[List[PoseResult]] = []
        for li, lig in enumerate(ligs):
            t = lig.num_torsions
            valid_ids = valid_by_lig[li]
            cnn_scores = {}
            if valid_ids and has_cnn:
                sc, aff, _loss, var = next(multi_scores)
                cnn_scores = {i: (float(sc[j]), float(aff[j]), float(var[j]))
                              for j, i in enumerate(valid_ids)}
            results: List[PoseResult] = []
            for i in valid_ids:
                e = float(energies[li, i])
                c = coords[li, i][:lig.num_atoms]
                cnnscore, cnnaff, cnnvar = cnn_scores.get(i, (0.0, 0.0, 0.0))
                results.append(PoseResult(
                    energy=e, intramol=float(intras[li, i]), cnnscore=cnnscore,
                    cnnaffinity=cnnaff, cnnvariance=cnnvar, coords=c,
                    conf_position=np.asarray(confs.position[li, i]),
                    conf_orientation=np.asarray(confs.orientation[li, i]),
                    conf_torsions=np.asarray(confs.torsions[li, i])[:t]))
            results = self._sort(results)
            results = self._remove_redundant(results, lig)
            all_results.append(results[: s.num_modes])
        _tick("assemble")
        return all_results

    def _build_dock_program(self, max_layers, chunk_steps, miniters, num_out,
                            cnn_obj, use_cnn_metro, use_cnn_refine,
                            use_cnn_search, use_grid_search=False,
                            fused=None, fused_out=None, fused_mc=None,
                            mesh=None, refine_subs=1):
        """Three jitted programs: chain init, a bounded MC chunk, and the
        merge+refine finish.  Chunking keeps each device program execution
        short (the single-chip tunnel kills very long executions) and the
        carried state doubles as a resume checkpoint (SURVEY.md section 5:
        the reference has no docking checkpointing; here it falls out of
        the design)."""
        s = self.settings
        minpar = MinimizeParams(
            maxiters=miniters,
            type=("simple" if s.simple_ascent
                  else "accurate" if s.accurate_line_search else "fast"),
            fused_trials=s.fused_line_search,
            early_term=s.minimize_early_term)
        # --minimize_single_full (main.cpp:987, monte_carlo.cpp:117-133):
        # minimize at full v from the start and skip the separate full-v
        # refinement of promising poses
        hunt = ((1000.0, 1000.0, 1000.0) if s.minimize_single_full
                else mc.MCParams.hunt_cap)
        stride = (max(chunk_steps, 1 << 20) if s.minimize_single_full
                  else s.refine_stride)
        mcpar = mc.MCParams(num_steps=chunk_steps, temperature=s.temperature,
                            num_saved_mins=num_out, minparams=minpar,
                            hunt_cap=hunt, refine_stride=stride)
        cap = jnp.full((3,), s.forcecap, jnp.float32)
        efn = self._make_efn(max_layers)
        refine = self._build_refine(efn, minpar, cap)
        slope = 1e3
        exhaustiveness = s.exhaustiveness

        def energy_fns_for(lig_d, rec_d, box, grids=None):
            authentic_v1 = jnp.float32(1000.0)
            fns = {
                "eval_deriv": lambda conf, v: efn.eval_deriv(
                    lig_d, rec_d, conf, box, slope, v),
                "eval_energy": lambda conf, v: efn.eval_energy(
                    lig_d, rec_d, conf, box, slope, v),
                # metropolis/update energy = the search igrid's inter-only
                # eval at authentic v (update_energy, monte_carlo.cpp:44-47;
                # ig_metropolis == ig for standard docking,
                # parallel_mc.cpp:161-162)
                "metro_on_coords": lambda coords: efn.inter_on_coords(
                    lig_d, rec_d, coords, box, slope, authentic_v1),
            }
            if use_grid_search and grids is not None:
                # MC minimization on the precomputed grids (do_search passes
                # the cache as the search igrid, main.cpp:504); metropolis
                # uses the same grids (cheap trilinear, no pair tensor)
                def grid_total(conf, v):
                    coords = fk.fk_coords(lig_d, conf, max_layers)
                    e = cg.cache_inter_energy(
                        grids, coords, lig_d.types, lig_d.charges,
                        lig_d.heavy_mask, slope, v[1])
                    return e + efn.pairs_on_coords(lig_d, coords, v[0], v[2])

                def grid_deriv(conf, v):
                    t = conf.torsions.shape[-1]

                    def f(eps):
                        return grid_total(
                            fk.conf_with_increment_var(conf, eps), v)

                    return jax.value_and_grad(f)(
                        jnp.zeros((6 + t,), jnp.float32))

                fns["eval_deriv"] = grid_deriv
                fns["eval_energy"] = grid_total
                fns["metro_on_coords"] = lambda coords: cg.cache_inter_energy(
                    grids, coords, lig_d.types, lig_d.charges,
                    lig_d.heavy_mask, slope, authentic_v1)
            if use_cnn_metro:
                fns["metro_on_coords"] = lambda coords: cnn_obj[
                    "value_on_coords"](lig_d, coords, slope)
            if use_cnn_search:
                def _cnn_deriv(conf, v):
                    center = jax.lax.stop_gradient(
                        cnn_obj["center_of"](lig_d, conf))
                    return cnn_obj["deriv"](lig_d, conf, center, slope)

                def _cnn_value(conf, v):
                    center = cnn_obj["center_of"](lig_d, conf)
                    return cnn_obj["value"](lig_d, conf, center, slope)

                fns["eval_deriv"] = _cnn_deriv
                fns["eval_energy"] = _cnn_value
            return fns

        @jax.jit
        def init_fn(lig_batch, lo, hi, keys):
            def one(lig_d, key):
                ks = jax.random.split(key, exhaustiveness)
                return jax.vmap(lambda kk: mc.mc_init(
                    kk, lig_d, mcpar, lo, hi, max_layers))(ks)

            return jax.vmap(one)(lig_batch, keys)

        if fused is not None:
            from gnina_tpu.ops import mc_fused as mcf
            from gnina_tpu.ops import pallas_dock as pdk

            tp_slots = fused.m - 1

            if mesh is not None:
                # SPMD over the lane axis: pallas_call cannot be
                # auto-partitioned, so the kernel runs inside shard_map
                # with the pack's lane-minor arrays split over "dp" (the
                # pack was laid out per shard by build_pack(shards=dp));
                # RNG offsets keep every lane's stream identical to the
                # unsharded program (SURVEY section 2: ligand batches over
                # ICI, no collectives in the docking inner loop)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                pack_sp = pdk.DockPack(
                    lc=P(None, None, "dp"), ap=P(None, None, "dp"),
                    nodeoh=P(None, None, "dp"), parentoh=P(None, None, "dp"),
                    parentohT=P(None, None, "dp"),
                    relax=P(None, None, "dp"), relo=P(None, None, "dp"),
                    laymask=P(None, None, "dp"), imask=P(None, None, "dp"),
                    dofmask=P(None, "dp"), rec=P(None, None),
                    heavy_idx=P(None, None))
                meta_sp = mcf.LaneMeta(
                    ntors=P("dp"), has_rigid=P("dp"),
                    heavy_idx=P("dp", None), heavy_mask=P("dp", None))

            def _chunk_body(flat, key, pack, meta, scal_h, scal_f):
                if mesh is not None:
                    lanes_local = flat.e.shape[0]
                    blocks_local = pack.lc.shape[-1] // pdk.LB
                    shard = jax.lax.axis_index("dp")
                else:
                    lanes_local = blocks_local = shard = 0
                if fused_mc is not None:
                    return mcf.fused_mc_chunk_inkernel(
                        flat, key, chunk_steps, fused_mc, fused, pack,
                        scal_h, scal_f, meta, mcpar, tp_slots,
                        seed_offset=(shard * blocks_local
                                     if mesh is not None else 0),
                        refine_subs=refine_subs)
                return mcf.fused_mc_chunk(
                    flat, key, chunk_steps, fused, pack, scal_h, scal_f,
                    meta, mcpar, tp_slots,
                    lane_offset=(shard * lanes_local
                                 if mesh is not None else 0))

            @jax.jit
            def chunk_fn(carry, key, pack, meta, lo, hi):
                lg, e = carry.e.shape[:2]
                flat = mcf._flatten_carry(carry)
                hc = mcpar.hunt_cap
                scal_h = fused.scal(hc[0], hc[1], slope, 1000.0, lo, hi,
                                    amplitude=mcpar.mutation_amplitude,
                                    temperature=mcpar.temperature)
                scal_f = fused.scal(1000.0, 1000.0, slope, 1000.0, lo, hi)
                if mesh is not None:
                    flat_sp = jax.tree_util.tree_map(lambda _: P("dp"), flat)
                    body = shard_map(
                        _chunk_body, mesh=mesh,
                        in_specs=(flat_sp, P(), pack_sp, meta_sp, P(), P()),
                        out_specs=flat_sp,
                        # pallas_call outputs carry no vma annotation
                        check_vma=False)
                    out = body(flat, key, pack, meta, scal_h, scal_f)
                else:
                    out = _chunk_body(flat, key, pack, meta, scal_h, scal_f)
                return mcf._unflatten_carry(out, lg, e)
        else:
            @jax.jit
            def chunk_fn(carry, lig_batch, dof_masks, num_tors_b, rigid_b,
                         rec_d, grids, lo, hi, keys):
                box = Box(lo=lo, hi=hi)

                def one(carry_l, lig_d, dof_mask, ntors, rigid, key):
                    fns = energy_fns_for(lig_d, rec_d, box, grids)
                    ks = jax.random.split(key, exhaustiveness)
                    return jax.vmap(lambda c, kk: mc.mc_chunk(
                        c, kk, chunk_steps, lig_d, fns, mcpar, max_layers,
                        dof_mask, ntors, rigid))(carry_l, ks)

                return jax.vmap(one)(carry, lig_batch, dof_masks, num_tors_b,
                                     rigid_b, keys)

        @jax.jit
        def merge_fn(carry, lig_batch):
            def one(carry_l, lig_d):
                merged = mc.merge_containers(carry_l.cont, lig_d.heavy_mask,
                                             min_rmsd=2.0, out_slots=num_out)
                conf = Conf(position=merged.position,
                            orientation=merged.orientation,
                            torsions=merged.torsions)
                done = jnp.zeros((num_out,), bool)
                return conf, done, merged.energy

            return jax.vmap(one)(carry, lig_batch)

        def _within(lig_d, conf, box):
            coords = fk.fk_coords(lig_d, conf, max_layers)
            margin = 0.0001
            ok = jnp.logical_and(coords >= box.lo - margin,
                                 coords <= box.hi + margin)
            ok = jnp.logical_or(ok, ~lig_d.heavy_mask[:, None])
            return jnp.all(ok)

        stage_fn_fused = None
        if fused is not None:
            from gnina_tpu.ops import pallas_dock as pdk2

            def _stage_body(flatc, donef, pack_out, scal, lo, hi):
                """One refine stage over a (local) flat lane axis."""
                lanes = donef.shape[0]
                l_pad = pack_out.lc.shape[-1]
                rigid, tors = pdk2.conf_to_packed(flatc, fused_out.m)
                if l_pad > lanes:
                    rigid = jnp.pad(rigid, ((0, 0), (0, l_pad - lanes)))
                    tors = jnp.pad(tors, ((0, 0), (0, l_pad - lanes)))
                org, otr, _stats, coords_h = fused_out(rigid, tors, scal,
                                                       pack=pack_out)
                newc = pdk2.packed_to_conf(org[:, :lanes], otr[:, :lanes],
                                           fused_out.m - 1)
                # within-box on real heavy atoms (refine_structure's `done`)
                ch = jnp.transpose(coords_h[..., :lanes], (2, 1, 0))
                valid = (pack_out.ap[4, :, :lanes] > 0).T      # (lanes, NH)
                margin = 0.0001
                ok = ((ch >= lo - margin) & (ch <= hi + margin)).all(-1)
                new_done = jnp.where(valid, ok, True).all(-1)   # (lanes,)

                def keep(old, new):
                    dd = donef.reshape((-1,) + (1,) * (new.ndim - 1))
                    return jnp.where(dd, old, new)

                outc = jax.tree_util.tree_map(keep, flatc, newc)
                return outc, jnp.logical_or(donef, new_done)

            @jax.jit
            def stage_fn_fused(mconf, mdone, pack_out, meta_out, lo, hi,
                               slope_i):
                """refine_structure stage through the fused kernel: one lane
                per (ligand, saved pose), authentic-v BFGS at this stage's
                box slope (main.cpp:144-158)."""
                lg, so = mdone.shape
                lanes = lg * so
                flatc = jax.tree_util.tree_map(
                    lambda a: a.reshape((lanes,) + a.shape[2:]), mconf)
                donef = mdone.reshape(lanes)
                cap_v = float(s.forcecap)
                scal = fused_out.scal(cap_v, cap_v, slope_i, cap_v, lo, hi)
                if mesh is not None:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    conf_sp = jax.tree_util.tree_map(lambda _: P("dp"),
                                                     flatc)
                    body = shard_map(
                        _stage_body, mesh=mesh,
                        in_specs=(conf_sp, P("dp"), pack_sp, P(), P(), P()),
                        out_specs=(conf_sp, P("dp")),
                        # pallas_call outputs carry no vma annotation
                        check_vma=False)
                    outc, done2 = body(flatc, donef, pack_out, scal,
                                       jnp.asarray(lo), jnp.asarray(hi))
                else:
                    outc, done2 = _stage_body(flatc, donef, pack_out, scal,
                                              lo, hi)
                outc = jax.tree_util.tree_map(
                    lambda a: a.reshape((lg, so) + a.shape[1:]), outc)
                return outc, done2.reshape(lg, so)

        @jax.jit
        def stage_fn_xla(mconf, mdone, lig_batch, rec_d, lo, hi, slope_i):
            """One slope-escalation stage of refine_structure
            (main.cpp:144-158) over all ligands x saved poses."""
            box = Box(lo=lo, hi=hi)

            def make_refine_pose(lig_d):
                def refine_pose(pos, quat, tors, done):
                    conf = Conf(position=pos, orientation=quat, torsions=tors)
                    if use_cnn_refine:
                        center = jax.lax.stop_gradient(
                            cnn_obj["center_of"](lig_d, conf))
                        # receptor grid is loop-invariant over the BFGS
                        # (fixed center, rigid receptor): prepare it ONCE
                        # per pose instead of re-voxelizing ~5-6k receptor
                        # atoms inside every line-search eval
                        rec_g = cnn_obj["prep"](center)

                        def f(c):
                            return cnn_obj["deriv_p"](rec_g, lig_d, c,
                                                      center, slope_i)

                        def fv(c):
                            return cnn_obj["value_p"](rec_g, lig_d, c,
                                                      center, slope_i)
                    else:
                        def f(c):
                            return efn.eval_deriv(lig_d, rec_d, c, box,
                                                  slope_i, cap)

                        def fv(c):
                            return efn.eval_energy(lig_d, rec_d, c, box,
                                                   slope_i, cap)

                    res = bfgs(f, conf, minpar, f_val=fv)
                    new_done = _within(lig_d, res.x, box)
                    out = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(done, old, new), res.x,
                        conf)
                    return out, jnp.logical_or(done, new_done)

                return refine_pose

            def one(conf_l, done_l, lig_d):
                conf2, done2 = jax.vmap(make_refine_pose(lig_d))(
                    conf_l.position, conf_l.orientation, conf_l.torsions,
                    done_l)
                return conf2, done2

            if use_cnn_refine:
                # sequential over ligands AND over pose chunks, vmapped
                # only within a chunk: each concurrently-refined pose
                # holds per-model rec+lig grids (~12 MB each) plus conv
                # activations, so a full (ligands x num_out) vmap blows
                # HBM on real screens
                nout = mdone.shape[1]
                # pad the pose axis to a multiple of the chunk size so a
                # prime num_out (e.g. --num_mc_saved 13) does not degrade
                # to 1-pose sequential refinement (ADVICE r4); padded
                # poses carry done=True, which make_refine_pose already
                # treats as a no-op.
                pb = min(8, nout)
                npad = (-nout) % pb
                ntot = nout + npad

                def one_chunked(args):
                    conf_l, done_l, lig_d = args

                    def chunk(cargs):
                        c_pos, c_quat, c_tors, c_done = cargs
                        return jax.vmap(make_refine_pose(lig_d))(
                            c_pos, c_quat, c_tors, c_done)

                    padp = lambda x: jnp.concatenate(
                        [x, jnp.broadcast_to(x[:1], (npad,) + x.shape[1:])]
                    ) if npad else x
                    rs = lambda x: padp(x).reshape(
                        (ntot // pb, pb) + x.shape[1:])
                    done_p = (jnp.concatenate(
                        [done_l, jnp.ones((npad,), bool)]) if npad
                        else done_l)
                    conf2, done2 = jax.lax.map(chunk, (
                        rs(conf_l.position), rs(conf_l.orientation),
                        rs(conf_l.torsions),
                        done_p.reshape(ntot // pb, pb)))
                    unrs = lambda x: x.reshape(
                        (ntot,) + x.shape[2:])[:nout]
                    return (jax.tree_util.tree_map(unrs, conf2), unrs(done2))

                return jax.lax.map(one_chunked, (mconf, mdone, lig_batch))
            return jax.vmap(one)(mconf, mdone, lig_batch)

        @jax.jit
        def rescore_fn(mconf, menergy, lig_batch, rec_d, lo, hi):
            box = Box(lo=lo, hi=hi)

            def one(conf_l, energy_l, lig_d):
                def score_pose(pos, quat, tors, e_in):
                    conf = Conf(position=pos, orientation=quat, torsions=tors)
                    # exact rescore (always the empirical affinity, even in
                    # CNN modes — main.cpp:336-343), with the flex-exact
                    # affinity/intramolecular split (model.cu:352-407)
                    inter, intra = exact_split(efn, lig_d, rec_d, conf, box,
                                               slope, cap)
                    coords = fk.fk_coords(lig_d, conf, max_layers)
                    valid = e_in < MAX_FL
                    return (conf, jnp.where(valid, inter, MAX_FL), intra,
                            coords)

                return jax.vmap(score_pose)(
                    conf_l.position, conf_l.orientation, conf_l.torsions,
                    energy_l)

            return jax.vmap(one)(mconf, menergy, lig_batch)

        finish_fns = (merge_fn,
                      stage_fn_fused if fused is not None else stage_fn_xla,
                      rescore_fn)
        return init_fn, chunk_fn, finish_fns

    def _cnn_refine(self, cnn_obj, lig_d: LigandData, conf: Conf, box: Box,
                    minpar: MinimizeParams, max_layers: int) -> Conf:
        """refine_structure with the CNN objective: center fixed at the
        starting pose's heavy centroid, 5-stage slope escalation."""
        center = jax.lax.stop_gradient(cnn_obj["center_of"](lig_d, conf))
        # fixed center + rigid receptor: the receptor density grid is
        # invariant across all 5 slope stages — voxelize it once
        rec_g = cnn_obj["prep"](center)
        half_dim = self.cnn.max_dimension / 2.0

        def within(conf):
            coords = fk.fk_coords(lig_d, conf, max_layers)
            margin = 0.0001

            def inside(lo_, hi_):
                ok = jnp.logical_and(coords >= lo_ - margin,
                                     coords <= hi_ + margin)
                ok = jnp.logical_or(ok, ~lig_d.heavy_mask[:, None])
                return jnp.all(ok)

            # non_cache_cnn::within: inside the cnn box OR the search box
            return jnp.logical_or(inside(box.lo, box.hi),
                                  inside(center - half_dim, center + half_dim))

        def body(i, state):
            conf, done = state
            slope_i = 10.0 ** (i + 1.0)

            def f(c):
                return cnn_obj["deriv_p"](rec_g, lig_d, c, center, slope_i)

            def fv(c):
                return cnn_obj["value_p"](rec_g, lig_d, c, center, slope_i)

            res = bfgs(f, conf, minpar, f_val=fv)
            new_done = within(res.x)
            conf2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(done, old, new), res.x, conf)
            return conf2, jnp.logical_or(done, new_done)

        conf, _done = jax.lax.fori_loop(0, 5, body, (conf, jnp.asarray(False)))
        return conf

    def _sort(self, results: List[PoseResult]) -> List[PoseResult]:
        order = self.settings.sort_order
        if order == "auto":
            order = ("CNNscore" if self.cnn is not None
                     and self.settings.cnn_scoring != "none" else "Energy")
        if order == "CNNscore":
            return sorted(results, key=lambda r: -r.cnnscore)
        if order == "CNNaffinity":
            return sorted(results, key=lambda r: -r.cnnaffinity)
        return sorted(results, key=lambda r: r.energy)

    def _remove_redundant(self, results: List[PoseResult],
                          lig: LigandStruct) -> List[PoseResult]:
        """remove_redundant (main.cpp:185-195)."""
        from gnina_tpu.constants import IS_HYDROGEN

        heavy = ~IS_HYDROGEN[lig.types]
        kept: List[PoseResult] = []
        for r in results:
            ok = True
            for k in kept:
                d2 = ((r.coords[heavy] - k.coords[heavy]) ** 2).sum(axis=1).mean()
                if np.sqrt(d2) <= self.settings.out_min_rmsd:
                    ok = False
                    break
            if ok:
                kept.append(r)
        return kept
