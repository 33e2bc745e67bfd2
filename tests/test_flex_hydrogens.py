"""--flex_hydrogens: rotatable hydrogen-only branches (fast tier).

Reference semantics: main.cpp:1003,1150 set_fixed_rotable_hydrogens;
parsing.h:214-224 mobile_hydrogens_only (immobile branch-anchor atom is
exempt from the hydrogen check); terms.cpp:60-66 atom_rotors waives the
near-end heavy-degree test when hydrogens are flexible.  The flag only
affects PDBQT ligands — the SDF/OB path force-fixes
(PDBQTUtilities.cpp:460 OutputTree).
"""

from gnina_tpu.chem.pdbqt import parse_pdbqt_ligand
from gnina_tpu.chem.tree_build import build_tree_from_pdbqt

# ethanol-like fragment: rigid C-C root, BRANCH about C2-O with a single
# mobile polar hydrogen (the classic hydroxyl torsion ADT emits)
ETHANOL_PDBQT = """\
ROOT
ATOM      1  C1  LIG A   1       0.000   0.000   0.000  0.00  0.00    +0.000 C
ATOM      2  C2  LIG A   1       1.520   0.000   0.000  0.00  0.00    +0.000 C
ENDROOT
BRANCH   2   3
ATOM      3  O1  LIG A   1       2.180   1.200   0.000  0.00  0.00    -0.400 OA
ATOM      4  H1  LIG A   1       3.140   1.150   0.100  0.00  0.00    +0.210 HD
ENDBRANCH   2   3
TORSDOF 1
"""


def _build(fix):
    lig = parse_pdbqt_ligand(ETHANOL_PDBQT, name="etoh")
    return build_tree_from_pdbqt(lig, fix_rotable_hydrogens=fix)


def test_default_freezes_hydroxyl_branch():
    t = _build(fix=True)
    # OH branch merged into the root: one node, no torsions
    assert t.num_torsions == 0
    assert t.num_atoms == 4
    assert t.num_tors == 0.0


def test_flex_hydrogens_keeps_branch_mobile():
    t = _build(fix=False)
    assert t.num_torsions == 1
    # terms.cpp:63: C2-O rotor counts once (from the O end; the C2 end
    # fails the far-side heavy-degree test) -> num_tors == 0.5
    assert t.num_tors == 0.5


def test_cli_flag_exists():
    from gnina_tpu.cli import build_parser
    args, _ = build_parser().parse_known_args(["--flex_hydrogens"])
    assert args.flex_hydrogens is True
    args, _ = build_parser().parse_known_args([])
    assert args.flex_hydrogens is False
