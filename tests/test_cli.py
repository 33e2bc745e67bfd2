"""CLI end-to-end smoke tests (score_only / minimize in-process)."""

import os

import numpy as np
import pytest

from gnina_tpu.cli import build_parser, main

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


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
