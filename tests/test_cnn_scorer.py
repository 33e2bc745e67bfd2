"""CNN scorer integration tests using the packaged converted models."""

import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.models.registry import expand_model_names, load_model

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.mark.smoke
def test_ensemble_expansion():
    assert expand_model_names([]) == [
        "dense_1_3", "dense_1_3_PT_KD_3", "crossdock_default2018_KD_4"]
    assert expand_model_names(["fast"]) == ["all_default_to_default_1_3_1"]
    assert len(expand_model_names(["default1.0"])) == 5
    ens = expand_model_names(["crossdock_default2018_ensemble"])
    assert len(ens) >= 5
    assert all(n.startswith("crossdock_default2018") for n in ens)


def test_load_packaged_model():
    m = load_model("crossdock_default2018")
    assert m.grid_points == 48
    assert m.num_channels == 28
    assert m.resolution == 0.5
    m2 = load_model("default2017")
    assert m2.num_channels == 35  # its own typer maps


@pytest.mark.slow
def test_scorer_single_model_scores(tmp_path):
    from gnina_tpu.models.scorer import CNNScorer

    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    cnn = CNNScorer(["all_default_to_default_1_3_1"])
    score, aff, var = cnn.score_pose(rec, lig, lig.orig_coords)
    assert 0.0 <= score <= 1.0
    assert 2.0 < aff < 10.0   # reference asserts aff > 5 for the ensemble
    assert var == 0.0         # single model -> no variance
    # translating the ligand out of the pocket must reduce the pose score
    far = lig.orig_coords + 15.0
    score_far, aff_far, _ = cnn.score_pose(rec, lig, far)
    assert score_far < score + 1e-3
