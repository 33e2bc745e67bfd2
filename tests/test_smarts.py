"""SMARTS matcher unit tests (host-only, no device programs)."""

import pytest

from gnina_tpu.chem import sdf
from gnina_tpu.chem.smarts import SmartsError, SmartsPattern

ACRYLAMIDE = """test
  prog
  comment
  5  4  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.3300    0.0000    0.0000 C   0  0
    2.0000    1.2000    0.0000 C   0  0
    1.4000    2.3000    0.0000 O   0  0
    3.3500    1.2000    0.0000 N   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  3  5  1  0
M  END
$$$$
"""

BENZENE = """benzene
  prog
  comment
  6  6  0  0  0  0  0  0  0  0999 V2000
    1.3900    0.0000    0.0000 C   0  0
    0.6950    1.2038    0.0000 C   0  0
   -0.6950    1.2038    0.0000 C   0  0
   -1.3900    0.0000    0.0000 C   0  0
   -0.6950   -1.2038    0.0000 C   0  0
    0.6950   -1.2038    0.0000 C   0  0
  1  2  4  0
  2  3  4  0
  3  4  4  0
  4  5  4  0
  5  6  4  0
  6  1  4  0
M  END
$$$$
"""


def _mol(block):
    m = list(sdf.iter_sdf(block, is_text=True))[0]
    m.perceive_all()
    return m


@pytest.mark.parametrize("pattern,count", [
    ("C=C", 1), ("C(=O)N", 1), ("[$(C=O)]", 1), ("[CX3]=[OX1]", 1),
    ("[NX3H2]", 1), ("O=C", 1), ("C=CC(=O)N", 1), ("[CH2]=[CH1]", 1),
    ("S", 0), ("[R]", 0), ("[#6]", 3), ("[!#6]", 2), ("[#6,#7]", 4),
    ("[C;!$(C=O)]", 2), ("[OX1]", 1), ("N~C", 1), ("*", 5), ("[D1]", 3),
])
def test_acrylamide_counts(pattern, count):
    mol = _mol(ACRYLAMIDE)
    assert len(SmartsPattern(pattern).match_unique(mol)) == count


@pytest.mark.parametrize("pattern,count", [
    ("c", 6), ("C", 0), ("a", 6), ("[cR]", 6), ("[r6]", 6), ("c1ccccc1", 1),
    ("cc", 6), ("[c;!R]", 0),
])
def test_benzene_aromatic(pattern, count):
    mol = _mol(BENZENE)
    assert len(SmartsPattern(pattern).match_unique(mol)) == count


def test_ring_closure_mapping():
    mol = _mol(BENZENE)
    maps = SmartsPattern("c1ccccc1").match(mol)
    assert len(maps) == 12  # 6 starts x 2 directions
    assert all(len(set(m)) == 6 for m in maps)


def test_errors():
    for bad in ["", "C(", "[Qq]", "C1CC", "[", "$C"]:
        with pytest.raises((SmartsError, ValueError)):
            SmartsPattern(bad)
