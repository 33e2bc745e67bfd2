"""CNN-objective minimization with the reference's toy overlap model
(test_min.py equivalent): minimizing the CNN loss must pull the single-atom
ligand onto the receptor atom."""

import numpy as np
import pytest

from gnina_tpu.chem import ingest
from gnina_tpu.docking import DockingEngine, DockSettings

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.mark.slow
def test_overlap_minimization():
    from gnina_tpu.models.scorer import CNNScorer

    rec = ingest.Receptor.from_file(f"{DATA}/C.xyz")
    lig = next(ingest.iter_ligands(f"{DATA}/C1.xyz"))
    cnn = CNNScorer([f"{DATA}/overlap.pt"])
    eng = DockingEngine(
        DockSettings(cnn_scoring="refinement", minimize_iters=100),
        cnn_scorer=cnn)
    r = eng.minimize(rec, lig)
    # ligand carbon must land on the receptor carbon (reference asserts
    # < 0.1 A with its optimizer; allow a slightly looser bound)
    d = np.linalg.norm(r.coords[0] - rec.coords[0])
    d0 = np.linalg.norm(lig.orig_coords[0] - rec.coords[0])
    assert d < d0, (d, d0)
    assert d < 0.5, d
