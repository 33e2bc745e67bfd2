"""Companion tool tests: gninatyper, gninagrid, molcache, output writing."""

import os
import tempfile

import numpy as np
import pytest

from gnina_tpu.chem import ingest, molcache, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.tools import gninatyper

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def lig():
    mol = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    return build_tree_from_molecule(mol)


def test_gninatypes_roundtrip(lig, tmp_path):
    path = str(tmp_path / "lig.gninatypes")
    gninatyper.write_gninatypes(lig, path)
    coords, types = gninatyper.read_gninatypes(path)
    from gnina_tpu.constants import IS_HYDROGEN

    heavy = ~IS_HYDROGEN[lig.types]
    assert len(types) == heavy.sum()
    assert np.allclose(coords, lig.orig_coords[heavy], atol=1e-5)
    assert np.array_equal(types, lig.types[heavy])


def test_gninatypes_byte_layout(lig, tmp_path):
    """The .gninatypes byte layout IS the reference's atom_info struct
    written raw: little-endian float32 x,y,z + int32 smina type, 16
    bytes/atom, heavy atoms only, file order (gninatyper.cpp:30-35 struct,
    :73/:103/:151 out.write loops).  Pack the expectation independently and require
    byte equality — this is the interop contract for files produced by
    the reference's gninatyper."""
    import struct

    from gnina_tpu.constants import IS_HYDROGEN

    path = str(tmp_path / "lig.gninatypes")
    gninatyper.write_gninatypes(lig, path)
    expected = b"".join(
        struct.pack("<fffi", *(float(v) for v in lig.orig_coords[i]),
                    int(lig.types[i]))
        for i in range(lig.num_atoms) if not IS_HYDROGEN[lig.types[i]])
    with open(path, "rb") as f:
        got = f.read()
    assert got == expected
    assert len(got) % 16 == 0


def test_molcache_roundtrip(lig, tmp_path):
    path = str(tmp_path / "x.molcache")
    molcache.save_ligands(path, [lig, lig])
    back = list(molcache.load_ligands(path))
    assert len(back) == 2
    b = back[0]
    assert b.name == lig.name
    assert np.allclose(b.orig_coords, lig.orig_coords)
    assert np.array_equal(b.types, lig.types)
    assert np.array_equal(b.parent, lig.parent)
    assert b.num_tors == lig.num_tors


def test_sdf_write_parse_roundtrip(lig):
    from gnina_tpu.chem.sdf import parse_sdf_block, write_sdf_block

    text = write_sdf_block(lig.mol, coords=lig.orig_coords,
                           properties={"minimizedAffinity": "-7.5"})
    mol2 = parse_sdf_block(text)
    assert mol2.num_atoms() == lig.num_atoms
    assert np.allclose(mol2.coords(), lig.orig_coords, atol=1e-3)
    assert "minimizedAffinity" in text


def test_gninagrid_binmap(tmp_path):
    from gnina_tpu.tools.gninagrid import main as ggmain

    out = str(tmp_path / "grid")
    rc = ggmain(["-r", f"{DATA}/noelem_rec.pdb", "-l", f"{DATA}/noelem.sdf",
                 "-o", out, "--dimension", "11.5"])
    assert rc == 0
    # reference naming: {out}_{i}.{npts}.{nchannels}.binmap
    # (gninagrid.cpp output convention; 14 rec + 14 lig default channels)
    n = int(round(11.5 / 0.5)) + 1
    path = f"{out}_0.{n}.28.binmap"
    assert os.path.exists(path), os.listdir(os.path.dirname(out))
    grid = np.fromfile(path, np.float32).reshape(28, n, n, n)
    assert grid.max() > 0.5  # atoms present
    assert grid.min() >= -1e-5  # tiny negatives at the quadratic tail edge
