"""End-to-end fused-Pallas docking path (docking.py + ops/mc_fused.py).

Runs the real dock_batch pipeline with fused_search="on" in Pallas
interpret mode on CPU: MC chunk scan -> fused BFGS kernel per step ->
metropolis/container -> merge/refine/rescore.  Tiny step counts keep the
interpret-mode cost bounded; the assertions check pipeline integrity
(poses produced, energies physical, within-box) rather than search depth.
"""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.docking import DockingEngine, DockSettings

DATA = "/root/reference/test/gnina/data"

pytestmark = pytest.mark.slow


def test_fused_dock_end_to_end():
    import dataclasses

    # noelem + truncated receptor: interpret-mode kernel calls are cheap
    # enough for a 24-step search, which finds a negative-energy pose
    # robustly (a handful of steps is seed/compile-detail fragile: all
    # saved poses can legitimately be clashes)
    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])
    # fused_mc_in_kernel=False: this test covers the per-step host-driven
    # fused path (the in-kernel default is exercised by the test below)
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, num_mc_steps=24, exhaustiveness=2,
        fused_search="on", refine_stride=4, fused_mc_in_kernel=False))
    results = eng.dock_batch(rec, [lig, lig], center, size, seed=3)
    assert len(results) == 2
    lo = np.asarray(center) - np.asarray(size) / 2 - 1.0
    hi = np.asarray(center) + np.asarray(size) / 2 + 1.0
    for rr in results:
        assert rr, "no poses returned"
        for r in rr:
            assert np.isfinite(r.energy)
        # interpret-mode descent from clash starts matches the XLA bfgs
        # (the round-2 "interpret-mode divergence" was a probe artifact:
        # unpadded lane inputs NaN-poisoned whole-block reductions —
        # scripts/interpret_divergence_probe.py now shows trajectory
        # parity), so a 24-step search must find a negative-energy pose
        assert rr[0].energy < 0.0, rr[0].energy
        # best pose heavy atoms inside the (slightly padded) box
        from gnina_tpu.constants import IS_HYDROGEN

        heavy = ~IS_HYDROGEN[lig.types]
        c = rr[0].coords[heavy]
        assert (c >= lo).all() and (c <= hi).all()


def test_fused_dock_inkernel_mc_end_to_end():
    """fused_mc_in_kernel pipeline integrity: whole MC step windows run
    inside the Mosaic kernel, the host does one batched container merge
    per window (mc.batch_merge_candidates)."""
    import dataclasses

    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])
    # 24 steps like test_fused_dock_end_to_end: fewer is seed-fragile
    # (all saved poses can legitimately be clashes)
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, num_mc_steps=24, exhaustiveness=2,
        fused_search="on", fused_mc_in_kernel=True, fused_async_mc=False,
        fused_mc_steps=8, num_mc_saved=8, num_modes=4))
    results = eng.dock_batch(rec, [lig], center, size, seed=3)
    assert len(results) == 1
    assert results[0], "no poses returned"
    lo = np.asarray(center) - np.asarray(size) / 2 - 1.0
    hi = np.asarray(center) + np.asarray(size) / 2 + 1.0
    from gnina_tpu.constants import IS_HYDROGEN

    heavy = ~IS_HYDROGEN[lig.types]
    for r in results[0]:
        assert np.isfinite(r.energy)
    assert results[0][0].energy < 0.0, results[0][0].energy
    c = results[0][0].coords[heavy]
    assert (c >= lo).all() and (c <= hi).all()


def test_fused_dock_async_mc_end_to_end():
    """fused_async_mc pipeline integrity: fully per-lane MC state machines
    in-kernel, tick-flagged candidate stream, host-side FK reconstruction
    (pd.fk_packed) and batched merge."""
    import dataclasses

    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, num_mc_steps=16, exhaustiveness=2,
        fused_search="on", fused_mc_in_kernel=True, fused_mc_steps=8,
        fused_async_mc=True, fused_mc_tick_budget=12,
        num_mc_saved=8, num_modes=4))
    results = eng.dock_batch(rec, [lig], center, size, seed=3)
    assert len(results) == 1
    assert results[0], "no poses returned"
    lo = np.asarray(center) - np.asarray(size) / 2 - 1.0
    hi = np.asarray(center) + np.asarray(size) / 2 + 1.0
    from gnina_tpu.constants import IS_HYDROGEN

    heavy = ~IS_HYDROGEN[lig.types]
    for r in results[0]:
        assert np.isfinite(r.energy)
    assert results[0][0].energy < 0.0, results[0][0].energy
    c = results[0][0].coords[heavy]
    assert (c >= lo).all() and (c <= hi).all()


def test_fused_async_mc_subwindow_refine():
    """refine_subs > 1: the best accepted candidate of EACH sub-window is
    refined at full v and admitted to the container (mc_fused
    fused_mc_chunk_inkernel refine_subs; the r5 geometry-cadence
    decoupling).  Same pipeline-integrity assertions as the async test."""
    import dataclasses

    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, num_mc_steps=16, exhaustiveness=2,
        fused_search="on", fused_mc_in_kernel=True, fused_mc_steps=8,
        fused_async_mc=True, fused_mc_tick_budget=12,
        fused_refine_every=4,           # -> refine_subs = 2
        num_mc_saved=8, num_modes=4))
    results = eng.dock_batch(rec, [lig], center, size, seed=3)
    assert len(results) == 1
    assert results[0], "no poses returned"
    lo = np.asarray(center) - np.asarray(size) / 2 - 1.0
    hi = np.asarray(center) + np.asarray(size) / 2 + 1.0
    from gnina_tpu.constants import IS_HYDROGEN

    heavy = ~IS_HYDROGEN[lig.types]
    for r in results[0]:
        assert np.isfinite(r.energy)
    assert results[0][0].energy < 0.0, results[0][0].energy
    c = results[0][0].coords[heavy]
    assert (c >= lo).all() and (c <= hi).all()


@pytest.mark.smoke
def test_fused_eligibility_gating():
    """Flex/covalent/non-vina jobs must fall back to the XLA path."""
    eng = DockingEngine(DockSettings(fused_search="on", cnn_scoring="none"))
    mol = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    assert eng._fused_eligible([lig])

    # flex-marked ligand: ineligible
    import dataclasses

    flexed = dataclasses.replace(lig, num_lig_atoms=lig.num_atoms - 2)
    assert not eng._fused_eligible([flexed])

    # ad4-style scoring (electrostatics) is outside the fused family
    from gnina_tpu.scoring.builtin import get_scoring_function

    eng2 = DockingEngine(DockSettings(fused_search="on", scoring="ad4_scoring",
                                      cnn_scoring="none"),
                         sf=get_scoring_function("ad4_scoring"))
    assert not eng2._fused_eligible([lig])

    eng3 = DockingEngine(DockSettings(fused_search="off", cnn_scoring="none"))
    assert not eng3._fused_eligible([lig])
