"""End-to-end docking-engine tests (small step counts for CI speed)."""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.docking import DockingEngine, DockSettings

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def noelem():
    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    return rec, lig


@pytest.mark.smoke
def test_score_only_regression(noelem):
    """Reference regression anchor (test/gnina/test_gnina.py:54-65): Vina
    AND vinardo affinity < -8 on the noelem fixture.  Requires the
    reference's no-element "*" semantics: typed Hydrogen/ignored
    (PDBQTUtilities.cpp:423-427), neighbours keep hydrophobe flags, and the
    isolated CH2 rotor drops out of num_tors (terms.cpp:52-71)."""
    rec, lig = noelem
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    r = eng.score_only(rec, lig)
    assert r.energy < -8.0
    assert np.isfinite(r.intramol)

    # vinardo scores differently but also < -8 (reference line 62-65)
    engv = DockingEngine(DockSettings(cnn_scoring="none", scoring="vinardo"))
    rv = engv.score_only(rec, lig)
    assert rv.energy < -8.0
    assert abs(rv.energy - r.energy) > 1e-3


def test_minimize_improves_energy(noelem):
    rec, lig = noelem
    eng = DockingEngine(DockSettings(cnn_scoring="none", minimize_iters=50))
    r0 = eng.score_only(rec, lig)
    r = eng.minimize(rec, lig)
    assert r.energy <= r0.energy + 1e-3
    assert 0.0 <= r.rmsd < 5.0


def test_randomize_only(noelem):
    rec, lig = noelem
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    center = lig.orig_coords.mean(axis=0)
    size = np.full(3, 12.0, np.float32)
    r = eng.randomize(rec, lig, center, size, seed=3, attempts=20)
    assert r.energy >= 0.0  # clash penalty
    # pose moved
    assert np.abs(r.coords - lig.orig_coords).max() > 0.5


def test_dock_small(noelem):
    rec, lig = noelem
    eng = DockingEngine(DockSettings(cnn_scoring="none", num_mc_steps=15,
                                     exhaustiveness=2, num_mc_saved=4,
                                     num_modes=4))
    center = lig.orig_coords.mean(axis=0)
    size = np.full(3, 14.0, np.float32)
    results = eng.dock(rec, lig, center, size, seed=7)
    assert len(results) >= 1
    es = [r.energy for r in results]
    assert es == sorted(es)  # Energy sort order without CNN
    assert all(np.isfinite(e) for e in es)
    # poses are inside (or very near) the search box
    lo = center - size / 2 - 1.0
    hi = center + size / 2 + 1.0
    heavy = results[0].coords
    assert np.all(heavy >= lo - 1.0) and np.all(heavy <= hi + 1.0)


def test_dock_batch_consistency(noelem):
    """dock_batch([lig, lig]) must produce the single-ligand results for
    matching seeds (same program, batched)."""
    rec, lig = noelem
    eng = DockingEngine(DockSettings(cnn_scoring="none", num_mc_steps=15,
                                     exhaustiveness=2, num_mc_saved=4,
                                     num_modes=4))
    center = lig.orig_coords.mean(axis=0)
    size = np.full(3, 14.0, np.float32)
    both = eng.dock_batch(rec, [lig, lig], center, size, seed=7)
    assert len(both) == 2
    # different fold_in seeds per slot -> results differ across slots
    assert len(both[0]) >= 1 and len(both[1]) >= 1
