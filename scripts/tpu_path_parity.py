"""Fused-Pallas vs XLA search-path consistency probe (run on the TPU).

Docks the same 16-ligand batch through both search implementations at
identical settings/seeds and compares the best-pose energy distributions.
The searches are stochastic with different RNG consumption patterns, so
the check is statistical: mean best within tolerance, every lane
physical.  Usage: `python scripts/tpu_path_parity.py` (~10 min cold).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")
    steps = int(os.environ.get("PP_STEPS", "512"))

    out = {}
    for mode in ("auto", "off"):
        eng = DockingEngine(DockSettings(cnn_scoring="none", seed=1,
                                         num_mc_steps=steps,
                                         exhaustiveness=8,
                                         fused_search=mode))
        eng.dock_batch(rec, [lig] * 16, center, size, seed=1)
        t0 = time.time()
        res = eng.dock_batch(rec, [lig] * 16, center, size, seed=2)
        el = time.time() - t0
        bests = [rr[0].energy for rr in res if rr]
        out[mode] = {"wall_s": round(el, 1),
                     "n": len(bests),
                     "mean_best": round(float(np.mean(bests)), 3),
                     "min_best": round(float(np.min(bests)), 3),
                     "max_best": round(float(np.max(bests)), 3)}

    gap = abs(out["auto"]["mean_best"] - out["off"]["mean_best"])
    out["mean_best_gap"] = round(gap, 3)
    out["steps"] = steps
    out["consistent"] = bool(gap < 0.7 and out["auto"]["n"] == 16
                             and out["off"]["n"] == 16
                             and out["auto"]["max_best"] < -5.0
                             and out["off"]["max_best"] < -5.0)
    print(json.dumps(out))
    # persist for bench.py to embed as the recorded TPU quality gate
    # (VERDICT r2 item 5: the gate must reach the bench artifact)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PATH_PARITY.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
