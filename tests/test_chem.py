"""Chemistry layer tests on the reference's own fixture files."""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, pdb, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.constants import IS_HYDROGEN, SminaType

DATA = "/root/reference/test/gnina/data"


def test_parse_10gs_ligand_sdf():
    mols = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))
    assert len(mols) == 1
    m = mols[0]
    assert m.num_atoms() > 20
    anums = {a.anum for a in m.atoms}
    assert 6 in anums and 7 in anums and 8 in anums and 16 in anums


def test_tree_build_10gs():
    m = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(m)
    # GSH-like ligand: expect a decent number of torsions
    assert lig.num_torsions >= 5
    assert lig.num_atoms == len(lig.types)
    # tree is consistent: every non-root node has a valid parent of lower layer
    for i in range(1, lig.num_nodes):
        p = lig.parent[i]
        assert 0 <= p < lig.num_nodes
        assert lig.layer[i] == lig.layer[p] + 1
        assert abs(np.linalg.norm(lig.rel_axis[i]) - 1.0) < 1e-5
    # local coords of node roots: origin atoms should be at 0 for branch
    # anchor atoms (first atom of each branch)
    assert np.allclose(lig.local_coords[0], 0.0, atol=1e-6)
    # pairs exclude hydrogens and same-node atoms
    for a, b in lig.pairs:
        assert lig.node_id[a] != lig.node_id[b]
        assert not IS_HYDROGEN[lig.types[a]]
        assert not IS_HYDROGEN[lig.types[b]]
    assert lig.num_heavy_atoms > 20
    assert lig.num_tors > 0


def test_fk_reproduces_input_coords():
    """Null conf (position=root origin, zero torsions) must reproduce the
    input pose exactly — but torsions in the input are NOT zero, so we check
    the invariant differently: FK at the null conf keeps every atom at its
    original position because local coords were derived from this pose."""
    import jax.numpy as jnp

    from gnina_tpu.ops.fk import fk_coords
    from gnina_tpu.types import initial_conf, pad_ligand

    m = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(m)
    t = lig.num_torsions
    padded = pad_ligand(lig, n_pad=lig.num_atoms, m_pad=lig.num_nodes,
                        p_pad=max(len(lig.pairs), 1))
    conf = initial_conf(lig, t)
    coords = np.asarray(fk_coords(padded, conf, max_layers=int(lig.layer.max())))
    assert np.allclose(coords, lig.orig_coords, atol=2e-3), \
        np.abs(coords - lig.orig_coords).max()


def test_parse_receptor_pdb():
    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    assert len(rec.types) > 3000
    # typing sanity: plenty of carbons and some donors/acceptors
    t = rec.types
    S = SminaType
    assert (t == S.AliphaticCarbonXSNonHydrophobe).sum() > 100
    assert (t == S.OxygenXSAcceptor).sum() > 100
    assert ((t == S.NitrogenXSDonor) | (t == S.NitrogenXSDonorAcceptor)).sum() > 50


def test_autobox():
    center, size = ingest.autobox_ligand(f"{DATA}/10gs_lig.sdf")
    assert size.min() >= 8.0  # 2*autobox_add
    # ligand centroid should be inside the box
    m = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    cent = m.coords().mean(axis=0)
    lo, hi = ingest.box_from_center_size(center, size)
    assert np.all(cent > lo) and np.all(cent < hi)


def test_receptor_pruning():
    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    center, size = ingest.autobox_ligand(f"{DATA}/10gs_lig.sdf")
    pruned = rec.pruned(center, size / 2, margin=8.0)
    assert 0 < len(pruned.types) < len(rec.types)


def test_pdbqt_rigid_parse():
    rec = ingest.Receptor.from_file(f"{DATA}/GSK3B_DFG_out_35-388-processed_rigid.pdbqt")
    assert len(rec.types) > 1000
    # charges read from columns
    assert np.abs(rec.charges).max() > 0.1
    # AD types respected: has polar hydrogens
    assert (rec.types == SminaType.PolarHydrogen).sum() > 50


def test_noelem_star_ignored():
    """SDF "*" atoms follow the reference's ignore semantics: typed
    Hydrogen (PDBQTUtilities.cpp:423-427), excluded from num_tors, and
    their carbon neighbours keep hydrophobe flags (no hetero demotion, as
    assign_bonds never bonds them)."""
    from gnina_tpu.chem import sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.constants import DEFAULT_TABLE, SminaType

    mol = list(sdf.iter_sdf(
        "/root/reference/test/gnina/data/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    names = [DEFAULT_TABLE.smina_names[int(t)] for t in lig.types]
    assert "GenericMetal" not in names
    assert names.count("Hydrogen") == 1  # the "*" atom, nothing else
    # its two carbon neighbours stay hydrophobic
    assert "AliphaticCarbonXSHydrophobe" in names
    # the isolated CH2 rotor drops out of num_tors (terms.cpp:52-71)
    assert lig.num_tors == 0.0
    # but the kinematic tree still has its 3 torsions (FindFragments runs
    # on the full molecule, reference GninaConverter.cpp:110-115)
    assert lig.num_torsions == 3
