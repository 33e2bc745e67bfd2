"""Flexible side-chain tests (FlexInfo equivalent)."""

import numpy as np
import pytest

from gnina_tpu.chem import flexinfo, ingest, sdf
from gnina_tpu.chem.tree_build import attach_flex, build_tree_from_molecule

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def system():
    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    return rec, lig


def test_select_by_distance(system):
    rec, lig = system
    keys = flexinfo.select_flex_residues(rec, flexdist=3.5,
                                         flexdist_coords=lig.orig_coords)
    assert len(keys) >= 1
    # ALA/GLY/PRO never selected
    names = {rec.mol.atoms[i].resname
             for i, a in enumerate(rec.mol.atoms)
             if (a.chain, a.resnum, a.icode) in keys}
    assert not names & flexinfo.INFLEXIBLE_RESIDUES


@pytest.mark.smoke
def test_select_by_spec(system):
    rec, _ = system
    # find some real arginine
    arg = next((a.chain, a.resnum, a.icode) for a in rec.mol.atoms
               if a.resname == "ARG")
    keys = flexinfo.select_flex_residues(rec, flexres=f"{arg[0]}:{arg[1]}")
    assert arg in keys


def test_extract_and_attach(system):
    rec, lig = system
    keys = flexinfo.select_flex_residues(rec, flexdist=3.0,
                                         flexdist_coords=lig.orig_coords,
                                         flex_max=2)
    frs = [flexinfo.extract_flex_residue(rec, k) for k in keys]
    frs = [f for f in frs if f is not None]
    assert frs
    fr = frs[0]
    # tree sanity: root segment has parent -1, unit axes
    assert fr.parent[0] == -1
    assert np.allclose(np.linalg.norm(fr.rel_axis, axis=1), 1.0, atol=1e-5)
    assert len(fr.inflex_types) >= 1  # CA at least

    combined = attach_flex(lig, frs)
    extra_tors = sum(f.num_torsions for f in frs)
    assert combined.num_torsions == lig.num_torsions + extra_tors
    assert combined.num_lig_atoms == lig.num_atoms
    assert combined.num_movable_atoms > lig.num_atoms
    assert combined.num_atoms > combined.num_movable_atoms  # inflex exist
    assert len(combined.other_pairs) > 0

    # FK with zero torsions must reproduce all original coordinates,
    # including flex side chains and static inflex anchors
    import jax.numpy as jnp

    from gnina_tpu.ops.fk import fk_coords
    from gnina_tpu.types import initial_conf, pad_ligand

    padded = pad_ligand(combined, combined.num_atoms, combined.num_nodes,
                        max(len(combined.pairs), 1))
    conf = initial_conf(combined, combined.num_torsions)
    ml = int(combined.layer.max())
    coords = np.asarray(fk_coords(padded, conf, ml))
    assert np.allclose(coords, combined.orig_coords, atol=2e-3), \
        np.abs(coords - combined.orig_coords).max()

    # rotating a flex torsion moves only that residue's downstream atoms
    tors = np.zeros(combined.num_torsions, np.float32)
    flex_node_start = lig.num_nodes
    tors[flex_node_start - 1] = np.pi / 2  # first flex root torsion
    conf2 = conf._replace(torsions=jnp.asarray(tors))
    coords2 = np.asarray(fk_coords(padded, conf2, ml))
    moved = np.abs(coords2 - combined.orig_coords).max(axis=1) > 1e-3
    # ligand atoms unmoved
    assert not moved[: lig.num_atoms].any()
    # some flex atom moved
    assert moved[lig.num_atoms: combined.num_movable_atoms].any()
    # inflex static
    assert not moved[combined.num_movable_atoms:].any()


def test_flex_dock_smoke(system):
    """End-to-end tiny dock with one flexible residue."""
    rec, lig = system
    keys = flexinfo.select_flex_residues(rec, flexdist=3.0,
                                         flexdist_coords=lig.orig_coords,
                                         flex_max=1)
    frs = [f for f in (flexinfo.extract_flex_residue(rec, k) for k in keys)
           if f is not None][:1]
    assert frs
    rigid = flexinfo.strip_flex_from_receptor(rec, frs)
    assert len(rigid.types) < len(rec.types)
    combined = attach_flex(lig, frs)

    from gnina_tpu.docking import DockingEngine, DockSettings

    eng = DockingEngine(DockSettings(cnn_scoring="none", num_mc_steps=10,
                                     exhaustiveness=2, num_mc_saved=3,
                                     num_modes=3))
    center = lig.orig_coords.mean(axis=0)
    size = np.full(3, 14.0, np.float32)
    results = eng.dock(rigid, combined, center, size, seed=5)
    assert len(results) >= 1
    assert np.isfinite(results[0].energy)
    # result coords cover ligand + flex + inflex
    assert results[0].coords.shape[0] == combined.num_atoms
