"""-flex PDBQT input: parse user-supplied flexible residues into trees.

reference: parse_pdbqt.cpp parse_pdbqt_flex + postprocess_residue
(parse_pdbqt.cpp:393-420), fixture test/gnina/data/flex_res_side_chain.pdbqt.
"""

import os

import numpy as np
import pytest

from gnina_tpu.chem.flexinfo import flex_from_pdbqt

FIXTURE = "/root/reference/test/gnina/data/flex_res_side_chain.pdbqt"

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixture not mounted")


@pytest.fixture(scope="module")
def flexres():
    with open(FIXTURE) as f:
        return flex_from_pdbqt(f.read())


def test_parse_residue(flexres):
    assert len(flexres) == 1
    fr = flexres[0]
    assert fr.resname == "CYS"
    assert fr.key[0] == "A" and fr.key[1] == 199
    # ROOT atom (CA) is the static inflex anchor
    assert len(fr.inflex_types) == 1
    # the fixture declares 10 active torsions = 10 BRANCH segments
    assert len(fr.parent) == 10
    # exactly one first_segment (off the single root atom)
    assert int((fr.parent < 0).sum()) == 1
    assert fr.layer[fr.parent < 0].min() == 1


def test_tree_geometry(flexres):
    fr = flexres[0]
    # every node's axis is unit length
    norms = np.linalg.norm(fr.rel_axis, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # node-contiguous atom order
    assert (np.diff(fr.node_of_atom) >= 0).all()
    # pairs exist and index into movable+inflex
    total = len(fr.types) + len(fr.inflex_types)
    assert len(fr.pairs) > 0
    assert fr.pairs.max() < total


def test_attach_to_ligand(flexres):
    """The parsed flex residue merges into a ligand DOF vector and FK
    reproduces the input geometry at the null conf."""
    from gnina_tpu.chem import sdf
    from gnina_tpu.chem.tree_build import attach_flex, \
        build_tree_from_molecule
    from gnina_tpu.ops import fk
    from gnina_tpu.types import initial_conf, pad_ligand

    lig_sdf = "/root/reference/test/gnina/data/10gs_lig.sdf"
    mol = list(sdf.iter_sdf(lig_sdf))[0]
    lig = build_tree_from_molecule(mol)
    merged = attach_flex(lig, flexres)
    assert merged.num_atoms > lig.num_atoms
    assert merged.num_torsions == lig.num_torsions + 10

    n = ((merged.num_atoms + 7) // 8) * 8
    m = ((merged.num_nodes + 3) // 4) * 4
    lig_d = pad_ligand(merged, n, m, max(32, len(merged.pairs)))
    conf = initial_conf(merged, m - 1)
    max_layers = int(merged.layer.max())
    coords = np.asarray(fk.fk_coords(lig_d, conf, max_layers))
    np.testing.assert_allclose(coords[:merged.num_atoms],
                               merged.orig_coords, atol=1e-3)
