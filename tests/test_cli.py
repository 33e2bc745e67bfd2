"""CLI end-to-end smoke tests (score_only / minimize in-process)."""

import os

import numpy as np
import pytest

from gnina_tpu.cli import build_parser, main

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.mark.smoke
def test_parser_accepts_gnina_flags():
    p = build_parser()
    args, _ = p.parse_known_args([
        "-r", "rec.pdb", "-l", "lig.sdf", "--autobox_ligand", "x.sdf",
        "--exhaustiveness", "16", "--cnn_scoring", "rescore",
        "--cnn", "dense_1_3", "--seed", "42", "--num_modes", "5",
        "--scoring", "vinardo", "--min_rmsd_filter", "2.0",
        "--pose_sort_order", "Energy", "--cpu", "4", "--no_gpu",
    ])
    assert args.exhaustiveness == 16
    assert args.scoring == "vinardo"
    assert args.cnn == ["dense_1_3"]


def test_cli_score_only(tmp_path, capsys):
    out = str(tmp_path / "out.sdf")
    log = str(tmp_path / "log.txt")
    rc = main(["-r", f"{DATA}/noelem_rec.pdb", "-l", f"{DATA}/noelem.sdf",
               "--score_only", "--cnn_scoring", "none", "-o", out,
               "--log", log, "-q"])
    assert rc == 0
    text = open(log).read()
    assert "Affinity:" in text
    aff = float(text.split("Affinity:")[1].split()[0])
    assert aff < -5.0
    sdf_text = open(out).read()
    assert "minimizedAffinity" in sdf_text
    assert "$$$$" in sdf_text


def test_cli_config_file(tmp_path):
    cfg = tmp_path / "conf.txt"
    cfg.write_text("receptor = %s/noelem_rec.pdb\n"
                   "ligand = %s/noelem.sdf\nscore_only\n"
                   "cnn_scoring = none\n" % (DATA, DATA))
    log = str(tmp_path / "log.txt")
    rc = main(["--config", str(cfg), "--log", log, "-q"])
    assert rc == 0
    assert "Affinity:" in open(log).read()


def test_cli_screen_resume(tmp_path):
    """--resume: a prepared {out}.partial skips finished ligands and the
    final SDF still contains every ligand in input order."""
    from gnina_tpu.chem import sdf as sdfmod

    D = "/root/reference/test/gnina/data"
    two = tmp_path / "two.sdf"
    two.write_text(open(f"{D}/noelem.sdf").read()
                   + open(f"{D}/noelem.sdf").read())
    out = tmp_path / "out.sdf"

    # fabricate a partial with ligand 0 "already docked"
    fake_pose = open(f"{D}/noelem.sdf").read()
    if not fake_pose.endswith("$$$$\n"):
        fake_pose += "$$$$\n"
    (tmp_path / "out.sdf.partial").write_text(
        "#GNINA_TPU_IDX 0 CHEMBL371307_PLANTS_09\n" + fake_pose)

    rc = main(["-r", f"{D}/noelem_rec.pdb", "-l", str(two),
               "--autobox_ligand", f"{D}/noelem.sdf",
               "--cnn_scoring", "none", "--num_mc_steps", "4",
               "--exhaustiveness", "2", "--num_mc_saved", "2",
               "--num_modes", "1", "--seed", "5", "--resume",
               "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    # ligand 0 came from the partial verbatim; ligand 1 was docked
    assert text.startswith(fake_pose[:200])
    assert text.count("$$$$") >= 2
    # partial is consumed on successful completion
    assert not (tmp_path / "out.sdf.partial").exists()


@pytest.mark.smoke
def test_cli_print_dumps(capsys):
    """--print_terms/--print_atom_types are pure table dumps exiting 0
    before input validation (main.cpp:1130-1139); --cnn_rotation is the
    reference spelling (main.cpp:1022); --approximation/--factor parse
    and warn (main.cpp:989-990, redesigned away)."""
    assert main(["--print_terms"]) == 0
    out = capsys.readouterr().out
    assert "gauss(o=0,_w=0.5,_c=8)" in out
    assert "num_tors_div" in out
    assert "atom_type_lennard_jones(t1=,t2=,o=0,_^=100,_c=8)" in out

    assert main(["--print_atom_types"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("#Name radius depth solvation volume")
    assert "AliphaticCarbonXSHydrophobe" in out
    assert len(out.strip().splitlines()) == 29  # header + 28 types

    p = build_parser()
    args, unk = p.parse_known_args(
        ["--cnn_rotation", "4", "--approximation", "spline",
         "--factor", "10"])
    assert not unk
    assert args.cnn_rotations == 4
    assert args.approximation == "spline"
    assert args.factor == 10.0


def test_cli_outputmin_frames(tmp_path, monkeypatch):
    """--outputmin N writes minout.sdf with N+1 interpolated frames per
    accepted minimization step (bfgs.h:244-310); first frame is the
    input pose."""
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "min.sdf")
    rc = main(["-r", f"{DATA}/noelem_rec.pdb", "-l", f"{DATA}/noelem.sdf",
               "--minimize", "--minimize_iters", "8", "--outputmin", "2",
               "--cnn_scoring", "none", "-o", out, "-q"])
    assert rc == 0
    text = (tmp_path / "minout.sdf").read_text()
    nframes = text.count("$$$$")
    assert nframes > 0 and nframes % 3 == 0  # (N+1)=3 frames per step
    # first frame == input pose coords (minout atoms are in tree order)
    from gnina_tpu.chem import sdf as sdfmod
    from gnina_tpu.chem.tree_build import build_tree_from_molecule

    mols = list(sdfmod.iter_sdf(str(tmp_path / "minout.sdf")))
    ref = build_tree_from_molecule(
        list(sdfmod.iter_sdf(f"{DATA}/noelem.sdf"))[0])
    np.testing.assert_allclose(mols[0].coords(), ref.orig_coords, atol=2e-3)


def test_cli_simple_ascent_minimize(tmp_path):
    """--simple_ascent (main.cpp:1189-1191): legacy steepest descent
    drives --minimize and still improves the pose."""
    out = str(tmp_path / "min.sdf")
    log = str(tmp_path / "log.txt")
    rc = main(["-r", f"{DATA}/noelem_rec.pdb", "-l", f"{DATA}/noelem.sdf",
               "--minimize", "--minimize_iters", "150", "--simple_ascent",
               "--cnn_scoring", "none", "-o", out, "--log", log, "-q"])
    assert rc == 0
    text = open(log).read()
    aff = float(text.split("Affinity:")[1].split()[0])
    assert aff < -8.0  # score_only input is ~-8.09; descent improves it
