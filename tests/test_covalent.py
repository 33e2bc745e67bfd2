"""Covalent docking: receptor-atom spec, complex building, end-to-end dock.

reference: covinfo.cpp, molgetter.cpp createCovalentMoleculeInModel.
"""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.covalent import CovInfo, CovOptions, \
    build_covalent_complex, extract_covres

REC_PDB = """ATOM      1  N   CYS A   7       0.000   0.000   0.000  1.00  0.00           N
ATOM      2  CA  CYS A   7       1.450   0.000   0.000  1.00  0.00           C
ATOM      3  CB  CYS A   7       2.000   1.400   0.000  1.00  0.00           C
ATOM      4  SG  CYS A   7       3.800   1.400   0.000  1.00  0.00           S
ATOM      5  C   CYS A   7       2.000  -0.700  -1.200  1.00  0.00           C
ATOM      6  O   CYS A   7       1.300  -1.500  -1.800  1.00  0.00           O
ATOM      7  N   GLY A   8       3.250  -0.400  -1.500  1.00  0.00           N
ATOM      8  CA  GLY A   8       3.900  -1.000  -2.650  1.00  0.00           C
ATOM      9  C   GLY A   8       5.350  -0.600  -2.800  1.00  0.00           C
ATOM     10  O   GLY A   8       6.000   0.000  -1.950  1.00  0.00           O
END
"""

# acrylamide warhead + tail: C=C-C(=O)-N-C-C
LIG_SDF = """warhead
  prog
  comment
  7  6  0  0  0  0  0  0  0  0999 V2000
    8.0000    4.0000    0.0000 C   0  0
    9.3300    4.0000    0.0000 C   0  0
   10.0000    5.2000    0.0000 C   0  0
    9.4000    6.3000    0.0000 O   0  0
   11.3500    5.2000    0.0000 N   0  0
   12.0500    6.4500    0.0000 C   0  0
   13.5500    6.3000    0.0000 C   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  3  5  1  0
  5  6  1  0
  6  7  1  0
M  END
$$$$
"""


@pytest.fixture(scope="module")
def rec(tmp_path_factory):
    p = tmp_path_factory.mktemp("cov") / "rec.pdb"
    p.write_text(REC_PDB)
    return ingest.Receptor.from_file(str(p))


@pytest.fixture(scope="module")
def lig_mol():
    return list(sdf.iter_sdf(LIG_SDF, is_text=True))[0]


def _cinfo(**kw):
    opts = CovOptions(covalent_rec_atom="A:7:SG",
                      covalent_lig_atom_pattern="[$(C=C)]", **kw)
    return CovInfo(opts, log=lambda *a: None)


@pytest.mark.smoke
def test_find_rec_atom(rec):
    ci = _cinfo()
    gi = ci.find_rec_atom(rec.mol)
    assert gi is not None
    assert rec.mol.atoms[gi].name.strip() == "SG"

    # coordinate addressing (covinfo.cpp:78-86)
    opts = CovOptions(covalent_rec_atom="3.8,1.4,0.0",
                      covalent_lig_atom_pattern="[$(C=C)]")
    ci2 = CovInfo(opts, log=lambda *a: None)
    assert ci2.find_rec_atom(rec.mol) == gi

    # resname-qualified form
    opts = CovOptions(covalent_rec_atom="A:7:CYS:SG",
                      covalent_lig_atom_pattern="[$(C=C)]")
    assert CovInfo(opts, log=lambda *a: None).find_rec_atom(rec.mol) == gi


def test_extract_covres(rec):
    ci = _cinfo()
    new_rec, covres, ratom = extract_covres(rec, ci)
    assert len(covres.atoms) == 6           # the CYS residue
    assert covres.atoms[ratom].name.strip() == "SG"
    assert len(new_rec.types) == len(rec.types) - 6
    assert covres.neighbors(ratom)          # bonded to CB


def test_build_complex_geometry(rec, lig_mol):
    ci = _cinfo()
    new_rec, complexes = build_covalent_complex(rec, lig_mol, ci)
    assert len(complexes) >= 1
    lig = complexes[0]

    # torsion-only DOF
    assert not lig.has_rigid_dof
    assert lig.num_torsions >= 2

    # the attachment atom (first ligand atom) sits one covalent-bond length
    # from SG
    sg = rec.coords[[a.name.strip() == "SG"
                     for a in rec.mol.atoms]][0]
    latom_pos = lig.orig_coords[0]
    d = np.linalg.norm(latom_pos - sg)
    assert 1.4 < d < 2.4, d

    # covres atoms ride along as static inflex
    assert lig.num_lig_atoms < lig.num_atoms
    assert lig.other_pairs is not None and len(lig.other_pairs) > 0


def test_user_position(rec, lig_mol):
    ci = _cinfo(covalent_lig_atom_position="5.0,2.0,0.5")
    _, complexes = build_covalent_complex(rec, lig_mol, ci)
    np.testing.assert_allclose(complexes[0].orig_coords[0],
                               [5.0, 2.0, 0.5], atol=1e-4)


def test_covalent_fk_torsion_only(rec, lig_mol):
    """FK through the covalent tree: torsions move ligand atoms, the pose's
    rigid-body DOF are inert, covres stays put."""
    import jax.numpy as jnp

    from gnina_tpu.ops import fk
    from gnina_tpu.types import Conf, initial_conf, pad_ligand

    _, complexes = build_covalent_complex(rec, lig_mol, _cinfo())
    lig = complexes[0]
    n = ((lig.num_atoms + 7) // 8) * 8
    m = ((lig.num_nodes + 3) // 4) * 4
    lig_d = pad_ligand(lig, n, m, 32)
    max_layers = int(lig.layer.max())
    conf = initial_conf(lig, m - 1)

    base = np.asarray(fk.fk_coords(lig_d, conf, max_layers))
    np.testing.assert_allclose(base[:lig.num_atoms], lig.orig_coords,
                               atol=1e-4)

    # rigid-body DOF inert
    conf2 = Conf(position=conf.position + 5.0,
                 orientation=jnp.array([0.0, 1.0, 0.0, 0.0]),
                 torsions=conf.torsions)
    moved = np.asarray(fk.fk_coords(lig_d, conf2, max_layers))
    np.testing.assert_allclose(moved, base, atol=1e-4)

    # first torsion spins the ligand about the covalent bond; covres fixed
    tors = conf.torsions.at[0].set(1.0)
    conf3 = Conf(position=conf.position, orientation=conf.orientation,
                 torsions=tors)
    spun = np.asarray(fk.fk_coords(lig_d, conf3, max_layers))
    nl = lig.num_lig_atoms
    assert np.abs(spun[:nl] - base[:nl]).max() > 0.1
    np.testing.assert_allclose(spun[nl:lig.num_atoms],
                               base[nl:lig.num_atoms], atol=1e-5)
    # the attachment atom is on the axis: it must not move
    np.testing.assert_allclose(spun[0], base[0], atol=1e-4)


@pytest.mark.slow
def test_covalent_dock_end_to_end(rec, lig_mol):
    from gnina_tpu.docking import DockingEngine, DockSettings

    _, complexes = build_covalent_complex(rec, lig_mol, _cinfo())
    lig = complexes[0]
    center = lig.orig_coords[:lig.num_lig_atoms].mean(axis=0)
    size = np.full(3, 12.0, np.float32)
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", exhaustiveness=2, num_mc_steps=16,
        mc_chunk_steps=16, minimize_iters=3, num_modes=3, num_mc_saved=5,
        search_grid=False, seed=11))
    results = eng.dock_batch(rec, [lig], center, size, seed=11)[0]
    assert results, "covalent dock returned no poses"
    for r in results:
        assert np.isfinite(r.energy)
        # attachment atom pinned through the whole search
        np.testing.assert_allclose(r.coords[0], lig.orig_coords[0],
                                   atol=1e-3)
