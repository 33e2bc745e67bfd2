"""--atom_terms / --atom_term_data / PDBQT pose output (fast tier).

Reference semantics: result_info.cpp:33-64 (per-atom weighted term table),
:150-155 (atomic_interaction_terms SD field), :159-176 (PDBQT MODEL
blocks); terms.cpp:208-265 evale_robust per-term-cutoff sums.
"""

import os

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.scoring.atom_terms import atom_terms_table, per_atom_term_values
from gnina_tpu.scoring.builtin import get_scoring_function

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def fixture():
    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    return rec, lig


def test_per_atom_values_sum_to_inter_energy(fixture):
    """Summing the per-atom weighted values over atoms and terms must give
    the weighted INTER energy (the table is just its per-atom split)."""
    rec, lig = fixture
    sf = get_scoring_function("vina")
    vals = per_atom_term_values(sf, lig.types, lig.orig_coords, lig.charges,
                                rec.types, rec.coords, rec.charges)
    assert vals.shape == (lig.num_atoms, len(sf.pair_terms))
    total = vals.sum()
    # independent direct evaluation
    from gnina_tpu.scoring.terms import gather_type_params
    import jax.numpy as jnp

    pa = gather_type_params(sf.table, lig.types)
    pb = gather_type_params(sf.table, rec.types)
    pa2 = {k: jnp.asarray(v)[:, None] for k, v in pa.items()}
    pb2 = {k: jnp.asarray(v)[None, :] for k, v in pb.items()}
    r = np.sqrt(((lig.orig_coords[:, None] - rec.coords[None]) ** 2)
                .sum(-1))
    from gnina_tpu.constants import IS_HYDROGEN

    heavy = (~IS_HYDROGEN[lig.types][:, None]
             & ~IS_HYDROGEN[rec.types][None, :])
    ref = 0.0
    for t, w in zip(sf.pair_terms, sf.pair_weights):
        v = np.asarray(t.eval(pa2, pb2, jnp.asarray(r, jnp.float32)))
        ref += w * np.where((r < t.cutoff) & heavy, v, 0.0).sum()
    np.testing.assert_allclose(total, ref, rtol=1e-5)


def test_atom_terms_table_format(fixture):
    rec, lig = fixture
    sf = get_scoring_function("vina")
    text = atom_terms_table(sf, lig, rec)
    lines = text.splitlines()
    assert lines[0].startswith("atomid el pos gauss(o=0,_w=0.5,_c=8)")
    assert "repulsion(o=0,_c=8)" in lines[0]
    assert lines[-1] == "END"
    assert len(lines) == lig.lig_atoms + 2


def test_pdbqt_pose_output_roundtrip(fixture):
    """-o x.pdbqt writes MODEL blocks whose BRANCH tree re-parses to the
    same torsion count and atom count."""
    from gnina_tpu.chem.pdbqt import parse_pdbqt_ligand
    from gnina_tpu.docking import PoseResult
    from gnina_tpu.output import write_poses_pdbqt

    rec, lig = fixture
    r = PoseResult(energy=-7.5, intramol=0.0, cnnscore=0.5, cnnaffinity=4.0,
                   cnnvariance=0.0, coords=lig.orig_coords,
                   conf_position=np.zeros(3), conf_orientation=np.zeros(4),
                   conf_torsions=np.zeros(lig.num_torsions))
    text = write_poses_pdbqt(lig, [r, r], cnn_enabled=True)
    assert text.count("MODEL") == 2
    assert "REMARK minimizedAffinity -7.5" in text
    assert "REMARK CNNscore" in text
    body = text.split("ENDMDL")[0]
    reparsed = parse_pdbqt_ligand(body)
    assert len(reparsed.mol.atoms) == lig.lig_atoms
    n_branches = body.count("\nBRANCH")
    assert n_branches == lig.num_nodes - 1
    assert f"TORSDOF {lig.torsdof}" in body


def test_cli_atom_terms_file(tmp_path, fixture):
    """score_only with --atom_terms writes the table file."""
    from gnina_tpu.cli import main

    out = tmp_path / "poses.sdf"
    at = tmp_path / "atoms.txt"
    rc = main(["-r", f"{DATA}/noelem_rec.pdb", "-l", f"{DATA}/noelem.sdf",
               "--score_only", "--cnn_scoring", "none",
               "-o", str(out), "--atom_terms", str(at),
               "--log", str(tmp_path / "log.txt")])
    assert rc == 0
    text = at.read_text()
    assert text.startswith("atomid el pos")
    assert text.rstrip().endswith("END")


def test_strip_h_flag_keeps_hydrogens():
    """--stripH off keeps explicit nonpolar hydrogens through tree build."""
    from gnina_tpu.chem.mol import Atom, Molecule

    def make():
        mol = Molecule(name="ethanol")
        # C-C-O with explicit H on the first carbon
        coords = [(0, 0, 0), (1.5, 0, 0), (2.2, 1.2, 0),
                  (-0.6, 0.9, 0), (-0.6, -0.9, 0)]
        anums = [6, 6, 8, 1, 1]
        for xyz, an in zip(coords, anums):
            mol.atoms.append(Atom(anum=an,
                                  coords=np.asarray(xyz, np.float32)))
        mol.add_bond(0, 1)
        mol.add_bond(1, 2)
        mol.add_bond(0, 3)
        mol.add_bond(0, 4)
        return mol

    stripped = build_tree_from_molecule(make())
    kept = build_tree_from_molecule(make(), strip_h=False)
    assert stripped.num_atoms == 3
    assert kept.num_atoms == 5
