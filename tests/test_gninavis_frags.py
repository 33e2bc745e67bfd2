"""gninavis bond-subgraph fragments (cnn_visualization.cpp:789-870:
findAllSubgraphsOfLengthsMtoN + add_adjacent_hydrogens) — fast tier,
pure graph logic."""

from gnina_tpu.chem import sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.tools.gninavis import bond_subgraph_fragments

# n-butanol: 4 carbons + hydroxyl; enough structure for subgraph counting
BUTANOL_SDF = """butanol
  test

 15 14  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.5200    0.0000    0.0000 C   0  0
    2.0800    1.4200    0.0000 C   0  0
    3.6000    1.4200    0.0000 C   0  0
    4.1500    2.7600    0.0000 O   0  0
   -0.4000   -1.0200    0.0000 H   0  0
   -0.4000    0.5000    0.8800 H   0  0
   -0.4000    0.5000   -0.8800 H   0  0
    1.9000   -0.5200    0.8800 H   0  0
    1.9000   -0.5200   -0.8800 H   0  0
    1.7200    1.9500    0.8800 H   0  0
    1.7200    1.9500   -0.8800 H   0  0
    3.9700    0.9000    0.8800 H   0  0
    3.9700    0.9000   -0.8800 H   0  0
    5.1100    2.7300    0.0000 H   0  0
  1  2  1  0
  2  3  1  0
  3  4  1  0
  4  5  1  0
  1  6  1  0
  1  7  1  0
  1  8  1  0
  2  9  1  0
  2 10  1  0
  3 11  1  0
  3 12  1  0
  4 13  1  0
  4 14  1  0
  5 15  1  0
M  END
$$$$
"""


def _lig():
    mol = list(sdf.iter_sdf(BUTANOL_SDF, is_text=True))[0]
    return build_tree_from_molecule(mol, strip_h=False)


def test_path_graph_subgraph_counts():
    lig = _lig()
    # heavy skeleton C-C-C-C-O is a path with 4 bonds: connected bond
    # subgraphs of sizes 1..4 on a path of k bonds number k, k-1, ... 1
    frags = bond_subgraph_fragments(lig, max_bonds=4)
    assert len(frags) == 4 + 3 + 2 + 1
    frags2 = bond_subgraph_fragments(lig, max_bonds=2)
    assert len(frags2) == 4 + 3


def test_adjacent_hydrogens_attached():
    lig = _lig()
    frags = bond_subgraph_fragments(lig, max_bonds=1)
    from gnina_tpu.constants import IS_HYDROGEN

    hyd = IS_HYDROGEN[lig.types]
    for frag in frags:
        heavies = [i for i in frag if not hyd[i]]
        assert len(heavies) == 2  # single bond
        # every hydrogen of those heavies is in the fragment
        for b in lig.mol.bonds:
            ah, bh = b.a, b.b
            if hyd[ah] and bh in heavies:
                assert ah in frag
            if hyd[bh] and ah in heavies:
                assert bh in frag


def test_fragments_are_connected_and_unique():
    lig = _lig()
    frags = bond_subgraph_fragments(lig, max_bonds=3)
    seen = {tuple(f) for f in frags}
    assert len(seen) == len(frags)
