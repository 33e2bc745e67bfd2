"""Small TPU docking probe: tiny shapes, env-tunable settings.

Used to bisect TPU compile crashes and measure per-step wall clock without
paying the full bench compile.  Knobs (env):
  PROBE_STRIDE   refine_stride (default 4)
  PROBE_FUSED    fused line search 0/1 (default 1)
  PROBE_STEPS    MC steps (default 64)
  PROBE_BATCH    ligand copies (default 8)
  PROBE_EXH      exhaustiveness (default 8)
  PROBE_GRID     search grids 0/1 (default 1)
  PROBE_LIG      "tiny" (inline butanol) or a path; default 10gs fixture
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings

    stride = int(os.environ.get("PROBE_STRIDE", "4"))
    fused = bool(int(os.environ.get("PROBE_FUSED", "1")))
    steps = int(os.environ.get("PROBE_STEPS", "64"))
    batch = int(os.environ.get("PROBE_BATCH", "8"))
    exh = int(os.environ.get("PROBE_EXH", "8"))
    grid = bool(int(os.environ.get("PROBE_GRID", "1")))
    which = os.environ.get("PROBE_LIG", "10gs")

    if which == "tiny":
        from __graft_entry__ import _TINY_LIG_SDF, _TINY_REC_PDB
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".pdb",
                                         delete=False) as f:
            f.write(_TINY_REC_PDB)
            rec = ingest.Receptor.from_file(f.name)
        mol = list(sdf.iter_sdf(_TINY_LIG_SDF, is_text=True))[0]
        lig = build_tree_from_molecule(mol)
        center = lig.orig_coords.mean(axis=0)
        size = np.full(3, 10.0, np.float32)
    else:
        data = "/root/reference/test/gnina/data"
        rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
        mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
        lig = build_tree_from_molecule(mol)
        center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")

    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, exhaustiveness=exh, num_mc_steps=steps,
        mc_chunk_steps=steps, refine_stride=stride, fused_line_search=fused,
        search_grid=grid))
    ligs = [lig] * batch

    t0 = time.time()
    res = eng.dock_batch(rec, ligs, center, size, seed=3)
    compile_s = time.time() - t0
    t0 = time.time()
    res = eng.dock_batch(rec, ligs, center, size, seed=4)
    run_s = time.time() - t0
    lanes = batch * exh
    print(json.dumps({
        "stride": stride, "fused": fused, "steps": steps, "batch": batch,
        "exh": exh, "grid": grid, "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 2),
        "ms_per_step": round(1000 * run_s / steps, 2),
        "lanes": lanes,
        "best": round(res[0][0].energy, 3) if res[0] else None,
        "npose": len(res[0]),
    }))


if __name__ == "__main__":
    main()
