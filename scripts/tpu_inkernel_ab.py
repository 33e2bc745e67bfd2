"""A/B the in-kernel-MC fused path vs the per-step fused path (real TPU).

One MODE per process (compile cache does not fully capture Pallas programs
across processes; a multi-config process also blows the 600 s ceiling):

    AB_MODE=base  python scripts/tpu_inkernel_ab.py   # fused, per-step MC
    AB_MODE=ink   python scripts/tpu_inkernel_ab.py   # fused, in-kernel MC

Prints one JSON line: wall for the warm run + best-pose stats, for the
default-ON decision (VERDICT r2 next-step 1).
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

    mode = os.environ.get("AB_MODE", "base")
    steps = int(os.environ.get("AB_STEPS", "1024"))
    nlig = int(os.environ.get("AB_NLIG", "16"))

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")

    trials = int(os.environ.get("AB_TRIALS", "10"))
    factor = float(os.environ.get("AB_FACTOR", "2.0"))
    async_ls = os.environ.get("AB_ASYNC", "0") == "1"
    async_mc = os.environ.get("AB_ASYNC_MC", "0") == "1"
    tick_budget = int(os.environ.get("AB_TICKS", "24"))
    mc_steps = int(os.environ.get("AB_MC_STEPS", "16"))
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=1, num_mc_steps=steps, exhaustiveness=8,
        fused_search="on", fused_mc_in_kernel=(mode == "ink"),
        fused_ls_trials=trials, fused_ls_factor=factor,
        fused_async_ls=async_ls, fused_async_mc=async_mc,
        fused_mc_tick_budget=tick_budget, fused_mc_steps=mc_steps))

    t0 = time.time()
    eng.dock_batch(rec, [lig] * nlig, center, size, seed=1)
    compile_s = time.time() - t0
    t0 = time.time()
    res = eng.dock_batch(rec, [lig] * nlig, center, size, seed=2)
    wall = time.time() - t0

    bests = [rr[0].energy for rr in res if rr]
    print(json.dumps({
        "mode": mode, "steps": steps, "nlig": nlig, "trials": trials,
        "factor": factor, "async_ls": async_ls, "async_mc": async_mc,
        "tick_budget": tick_budget, "mc_steps": mc_steps,
        "compile_s": round(compile_s, 1), "wall_s": round(wall, 2),
        "lig_per_s": round(nlig / wall, 4),
        "mean_best": round(float(np.mean(bests)), 3),
        "min_best": round(float(np.min(bests)), 3),
        "max_best": round(float(np.max(bests)), 3),
        "n": len(bests),
    }))


if __name__ == "__main__":
    main()
