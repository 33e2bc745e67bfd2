"""AD4 user-grid bias tests (--user_grid; grid.h:63, non_cache.cpp:168)."""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.docking import DockingEngine, DockSettings
from gnina_tpu.ops.user_grid import read_ad4_map, user_grid_atom_energy

from __graft_entry__ import _TINY_LIG_SDF, _TINY_REC_PDB


def _write_map(path, value, center, n=21, spacing=0.5):
    with open(path, "w") as f:
        f.write("GRID_PARAMETER_FILE\nGRID_DATA_FILE\nMACROMOLECULE\n")
        f.write(f"SPACING {spacing}\n")
        f.write(f"NELEMENTS {n - 1} {n - 1} {n - 1}\n")
        f.write(f"CENTER {center[0]:g} {center[1]:g} {center[2]:g}\n")
        f.write("\n".join(f"{value:g}" for _ in range(n ** 3)))
        f.write("\n")


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    d = tmp_path_factory.mktemp("ug")
    rec_p = d / "rec.pdb"
    rec_p.write_text(_TINY_REC_PDB)
    rec = ingest.Receptor.from_file(str(rec_p))
    mol = list(sdf.iter_sdf(_TINY_LIG_SDF, is_text=True))[0]
    lig = build_tree_from_molecule(mol)
    return d, rec, lig


def test_read_map_roundtrip(system):
    d, rec, lig = system
    p = d / "bias.map"
    _write_map(str(p), 0.25, [1.0, 2.0, 3.0])
    ug, center, size = read_ad4_map(str(p))
    assert ug.data.shape == (21, 21, 21)
    np.testing.assert_allclose(np.asarray(ug.data), 0.25)
    np.testing.assert_allclose(center, [1.25, 2.25, 3.25], atol=1e-5)
    np.testing.assert_allclose(size, 10.5, atol=1e-5)
    # in-box evaluation returns the constant; OOB adds a slope penalty
    inside = np.asarray(user_grid_atom_energy(
        ug, np.array([[1.0, 2.0, 3.0]], np.float32), 1e3))
    # evaluate_aux curls at c=1000 (grid.cpp:47-49): 0.25*1000/1000.25
    np.testing.assert_allclose(inside, 0.25, atol=1e-3)
    outside = np.asarray(user_grid_atom_energy(
        ug, np.array([[100.0, 2.0, 3.0]], np.float32), 1e3))
    assert outside[0] > 100.0


def test_score_only_bias_shift(system):
    """A constant user grid shifts the affinity argument by
    bias * n_heavy_movable (before the conf-independent division)."""
    d, rec, lig = system
    center = lig.orig_coords.mean(axis=0)
    bias = 0.5
    p = d / "b2.map"
    # box comfortably covering ligand + cutoff
    _write_map(str(p), bias, center, n=81, spacing=0.5)
    ug, _, _ = read_ad4_map(str(p))

    base = DockingEngine(DockSettings(cnn_scoring="none"))
    biased = DockingEngine(DockSettings(cnn_scoring="none"), user_grid=ug)
    r0 = base.score_only(rec, lig)
    r1 = biased.score_only(rec, lig)

    n_heavy = int(np.sum(~np.isin(lig.types, [0, 1])))
    divisor_ratio = r0.energy and 1.0
    # undo the conf-independent division to compare raw inter sums
    sf = base.sf
    inputs = {"num_tors": np.float32(lig.num_tors),
              "num_heavy_atoms": np.float32(lig.num_heavy_atoms),
              "num_hydrophobic_atoms": np.float32(lig.num_hydrophobic_atoms),
              "ligand_lengths_sum": np.float32(lig.ligand_length),
              "num_ligands": np.float32(1.0)}
    # conf_independent is monotone here; check the shift direction and
    # approximate magnitude via the divisor implied by r0
    assert r1.energy > r0.energy
    shift = r1.energy - r0.energy
    assert 0.2 * n_heavy * bias < shift < 1.2 * n_heavy * bias
