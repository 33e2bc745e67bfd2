"""--cnn_outputxyz/--cnn_outputdx/--cnn_gradient_check debug outputs
(main.cpp:1007,1030-1033) with the reference's toy overlap model."""

import os

import numpy as np
import pytest

from gnina_tpu.chem import ingest

pytestmark = pytest.mark.slow  # compiles CNN grad programs

DATA = "/root/reference/test/gnina/data"


class _Log:
    def __init__(self):
        self.text = ""

    def write(self, msg):
        self.text += msg


@pytest.fixture(scope="module")
def fixture():
    from gnina_tpu.models.scorer import CNNScorer

    rec = ingest.Receptor.from_file(f"{DATA}/C.xyz")
    lig = next(ingest.iter_ligands(f"{DATA}/C1.xyz"))
    cnn = CNNScorer([f"{DATA}/overlap.pt"])
    coords = lig.orig_coords.astype(np.float32)
    center = coords.mean(axis=0)
    rc, rt, rm = cnn._receptor_arrays(rec, center[None])
    return cnn, rec, lig, coords, center, (rc, rt, rm)


@pytest.mark.smoke
def test_outputxyz(tmp_path, fixture):
    from gnina_tpu.models import debug_out

    cnn, rec, lig, coords, center, (rc, rt, rm) = fixture
    lg, rg = debug_out.atom_gradients(cnn, rc, rt, rm, lig, coords, center)
    assert lg.shape == coords.shape
    assert rg.shape == rc.shape
    # the overlap model pulls the ligand toward the receptor atom:
    # nonzero gradient on the single ligand atom
    assert np.abs(lg).max() > 0
    path = str(tmp_path / "g_lig.xyz")
    debug_out.write_gradient_xyz(path, lig.types, coords, lg)
    lines = open(path).read().splitlines()
    assert lines[0] == str(lig.num_atoms)
    assert len(lines) == 2 + lig.num_atoms
    assert len(lines[2].split()) == 7  # El x y z gx gy gz


def test_outputdx(tmp_path, fixture):
    from gnina_tpu.models import debug_out
    from gnina_tpu.tools.gninagrid import read_dx

    cnn, rec, lig, coords, center, (rc, rt, rm) = fixture
    prefix = str(tmp_path / "g")
    written = debug_out.write_grid_gradient_dx(prefix, cnn, rc, rt, rm,
                                               lig, coords, center)
    m = cnn.models[0]
    assert len(written) == m.num_channels
    grid, c, res = read_dx(written[0])
    assert grid.shape == (m.grid_points,) * 3
    assert res == pytest.approx(m.resolution)
    # at least one channel has nonzero voxel gradient
    total = sum(np.abs(read_dx(p)[0]).sum() for p in written)
    assert total > 0


def test_gradient_check(fixture):
    from gnina_tpu.models import debug_out

    cnn, rec, lig, coords, center, (rc, rt, rm) = fixture
    log = _Log()
    worst = debug_out.gradient_check(cnn, rc, rt, rm, lig, coords, center,
                                     log, n_atoms=1, eps=0.05)
    assert "max relative error" in log.text
    # trilinear-smoothed gaussian density: analytic and numeric agree
    assert worst < 0.2, log.text


def test_cli_flags_parse():
    from gnina_tpu.cli import build_parser

    args, _ = build_parser().parse_known_args(
        ["--cnn_outputxyz", "--cnn_outputdx", "--cnn_gradient_check",
         "--cnn_xyzprefix", "pfx"])
    assert args.cnn_outputxyz and args.cnn_outputdx
    assert args.cnn_gradient_check
    assert args.cnn_xyzprefix == "pfx"
