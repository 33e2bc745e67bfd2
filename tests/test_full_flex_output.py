"""--full_flex_output: out_flex carries the whole structure (fast tier).

reference: main.cpp:963 (flag), molgetter.cpp:167-170 (set_rigid of the
H-stripped receptor), model.cpp:909-935 (write_context outputs rigid +
flex as one combined structure).
"""

import types

import numpy as np

from gnina_tpu.chem import flexinfo, ingest
from gnina_tpu.chem.tree_build import attach_flex, empty_ligand_struct
from gnina_tpu.output import write_flex_pdb

DATA = "/root/reference/test/gnina/data"


def _system():
    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    keys = flexinfo.select_flex_residues(rec, flexres="A:8", flexdist=-1,
                                         flexdist_coords=None)
    selected = [f for f in (flexinfo.extract_flex_residue(rec, k)
                            for k in keys) if f is not None]
    assert selected
    stripped = flexinfo.strip_flex_from_receptor(rec, selected)
    lig = attach_flex(empty_ligand_struct(), selected)
    return rec, stripped, lig


def test_full_flex_output_writes_whole_structure():
    rec, stripped, lig = _system()
    n = lig.orig_coords.shape[0]
    fake = types.SimpleNamespace(coords=np.asarray(lig.orig_coords))

    flex_only = write_flex_pdb(lig, [fake])
    full = write_flex_pdb(lig, [fake], rigid=stripped.mol)

    n_flex = sum(1 for ln in flex_only.splitlines()
                 if ln.startswith("ATOM"))
    n_full = sum(1 for ln in full.splitlines() if ln.startswith("ATOM"))
    n_rigid_heavy = sum(1 for a in stripped.mol.atoms if a.anum != 1)
    assert n_full == n_flex + n_rigid_heavy
    assert full.count("MODEL") == full.count("ENDMDL") == 1
    # rigid part keeps residue metadata; no hydrogens in the RIGID part
    # (molgetter.cpp:168 DeleteHydrogens; flex atoms may keep polar H)
    assert " GLY " in full or "GLY" in full
    atom_lines = [ln for ln in full.splitlines() if ln.startswith("ATOM")]
    for ln in atom_lines[:n_rigid_heavy]:
        assert not ln.rstrip().endswith(" H")


def test_full_flex_output_multi_model_serials():
    rec, stripped, lig = _system()
    fake = types.SimpleNamespace(coords=np.asarray(lig.orig_coords))
    full = write_flex_pdb(lig, [fake, fake], rigid=stripped.mol)
    assert full.count("MODEL") == 2
    # serials restart per model
    serials = [int(ln[6:11]) for ln in full.splitlines()
               if ln.startswith("ATOM")]
    assert serials.count(1) == 2
