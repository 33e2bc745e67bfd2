"""Root-cause probe for the interpret-mode BFGS divergence (ROADMAP gap 7).

From CLASH starts (pair energies 1e3-1e6) some interpret-mode lanes of the
fused kernel make no BFGS progress while the XLA bfgs descends.  This
probe isolates where they diverge:

  1. initial DOF gradient: kernel debug_grad dump vs XLA autodiff at the
     same conf (if pg flips sign the kernel marks the lane accepted
     up-front and no-ops forever);
  2. f(k) trajectories for maxiters k = 1..K through both paths;
  3. per-iteration trial counts (cnt_s) -> which Armijo behavior differs.

Runs on CPU (interpret mode) by design.  Usage:
    JAX_PLATFORMS=cpu python scripts/interpret_divergence_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.constants import IS_HYDROGEN
    from gnina_tpu.docking import (DockingEngine, DockSettings, pad_ligand,
                                   pad_receptor, _round_up)
    from gnina_tpu.ops import bfgs as xbfgs
    from gnina_tpu.ops import fk
    from gnina_tpu.ops import mc_fused
    from gnina_tpu.ops import pallas_dock as pdk
    from gnina_tpu.scoring.builtin import get_scoring_function
    from gnina_tpu.ops.energy import Box
    from gnina_tpu.types import Conf

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/noelem.sdf")
    from gnina_tpu.constants import IS_HYDROGEN
    # drop receptor hydrogens like the production paths do (szv_grid.h:91
    # excludes them; pad_receptor masks them): an earlier version of this
    # probe kept them in the kernel pack but not the XLA side, which
    # manufactured a phantom "energy divergence"
    hkeep = ~IS_HYDROGEN[rec.types]
    rec = dataclasses.replace(rec, coords=rec.coords[hkeep],
                              types=rec.types[hkeep],
                              charges=rec.charges[hkeep])
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])

    sf = get_scoring_function("vina")
    eng = DockingEngine(DockSettings(cnn_scoring="none"))

    # pack with exhaustiveness=1 -> 1 real lane, LB-pad
    kk = _round_up(len(rec.types), 128)
    rc = np.zeros((kk, 3), np.float32)
    rc[:len(rec.coords)] = rec.coords
    rt = np.zeros((kk,), np.int32)
    rt[:len(rec.types)] = rec.types
    rq = np.zeros((kk,), np.float32)
    rm = np.zeros((kk,), np.float32)
    rm[:len(rec.types)] = 1.0
    pack = pdk.build_pack([lig], rc, rt, rq, rm, 1, sf.table)
    meta = mc_fused.lane_meta([lig], 1, pack, lig.num_atoms)

    n, m, ly, kdim, l_pad = pdk._static_dims(pack)
    tp = m - 1

    # CLASH start: ligand root shoved into the receptor
    rng = np.random.default_rng(0)
    lo = np.asarray(center) - np.asarray(size) / 2
    hi = np.asarray(center) + np.asarray(size) / 2
    # deliberately near a receptor atom
    clash_pos = rec.coords[np.argmin(d[keep])].astype(np.float32)
    conf = Conf(position=jnp.asarray(clash_pos),
                orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                torsions=jnp.asarray(
                    rng.uniform(-np.pi, np.pi, tp).astype(np.float32)))

    box = Box(lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32))

    # ---- XLA reference: efn at hunt-cap v -------------------------------
    max_layers = _round_up(
        max(int(lig.layer.max()) if lig.num_nodes > 1 else 1, 1), 4)
    n_pad = _round_up(lig.num_atoms, 8)
    m_pad = m
    lig_d = pad_ligand(lig, n_pad, m_pad,
                       _round_up(max(len(lig.pairs), 1), 32))
    rec_d = pad_receptor(rc, rt, rq, kk)
    efn = eng._make_efn(max_layers)
    hunt = jnp.asarray([10.0, 10.0, 10.0], jnp.float32)
    cap = jnp.full((3,), 1000.0, jnp.float32)

    dof_mask = np.zeros(6 + tp, bool)
    dof_mask[:6 + lig.num_torsions] = True

    def f(c):
        e, g = efn.eval_deriv(lig_d, rec_d, c, box, 0.0, hunt)
        return e, g

    f0, g0 = jax.jit(f)(conf)
    print(f"XLA   f0 = {float(f0):.4f}")
    print(f"XLA   g0 = {np.array2string(np.asarray(g0)[:10], precision=3)}")

    # ---- kernel debug_grad: initial gradient ----------------------------
    fused_dbg = pdk.FusedBfgs(sf, pack, maxiters=1, want_metro=False,
                              interpret=True, debug_grad=True,
                              n_iter=int((pack.heavy_idx >= 0).sum()))
    rigid, tors = pdk.conf_to_packed(
        jax.tree_util.tree_map(lambda a: a[None], conf), m)
    # pad the lane axis to the kernel block width: interpret mode fills
    # out-of-spec reads with NaN, and NaN padding lanes poison the kernel's
    # whole-block reductions (sum(donef) in the loop conditions) — the
    # original version of this probe skipped every BFGS iteration that way
    rigid = jnp.pad(rigid, ((0, 0), (0, l_pad - 1)))
    tors = jnp.pad(tors, ((0, 0), (0, l_pad - 1)))
    scal = fused_dbg.scal(10.0, 10.0, 0.0, 1000.0, jnp.asarray(lo),
                          jnp.asarray(hi))
    org, otr, stats, coords = fused_dbg(rigid, tors, scal, pack=pack)
    kf0 = float(stats[0, 0])
    kg = np.asarray(coords)[:, :, 0]  # (3, n) dof gradient dump rows
    kg_flat = np.concatenate([kg[0], kg[1], kg[2]])[:6 + tp]
    print(f"KERN  f0 = {kf0:.4f}")
    print(f"KERN  g0 = {np.array2string(kg_flat[:10], precision=3)}")
    gx = np.asarray(g0)
    rel = np.abs(kg_flat - gx) / np.maximum(np.abs(gx), 1.0)
    print(f"grad rel err: max {rel.max():.2e}")
    pg_x = -float(np.dot(gx[dof_mask], gx[dof_mask]))
    pg_k = -float(np.dot(kg_flat[dof_mask], kg_flat[dof_mask]))
    print(f"pg (xla) = {pg_x:.4e}   pg (kern) = {pg_k:.4e}")

    # ---- trajectories ---------------------------------------------------
    print("\nmaxiters | XLA f | KERN f | KERN trials")
    # each maxiters value builds a distinct interpret kernel (~2-3 min
    # compile on this 1-core host); keep the list short
    for it in (1, 3, 8, 21):
        minpar = xbfgs.MinimizeParams(maxiters=it, type="fast",
                                      fused_trials=True)
        rx = xbfgs.bfgs(f, conf, minpar, dof_mask=jnp.asarray(dof_mask))
        fker = pdk.FusedBfgs(sf, pack, maxiters=it, want_metro=False,
                             interpret=True,
                             n_iter=int((pack.heavy_idx >= 0).sum()))
        org, otr, st, _ = fker(rigid, tors, scal, pack=pack)
        # stats rows: 0 = f_out, 1 = e_metro (0: want_metro=False),
        # 2 = line-search trial evals, 3 = bfgs iterations
        print(f"{it:8d} | {float(rx.f0):10.4f} | {float(st[0, 0]):10.4f} | "
              f"{float(st[2, 0]):5.0f}")


if __name__ == "__main__":
    main()
