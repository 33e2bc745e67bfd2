"""Focused pose-geometry probe: fused path only, one fixture, knob sweep.

The r5 quality gate exposed a fused-vs-XLA geometry deficit concentrated
on 184l (rmsd<2A 8/24 vs 15/24 at defaults).  This probe re-docks ONE
fixture through the fused path across candidate settings so the knee of
the (tick budget / window / trials) -> geometry curve can be found
without paying a full two-path three-fixture gate run per point.

Usage: FIXTURE=184l BUDGETS=16,20,24 SEEDS=1,2,3 STEPS=512 \
           python scripts/tpu_geom_probe.py
Compare against the XLA anchors recorded in QUALITY.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = "/root/reference/test/gnina/data"
FIXTURES = {
    "10gs": (f"{DATA}/10gs_rec.pdb", f"{DATA}/10gs_lig.sdf"),
    "184l": (f"{DATA}/184l_rec.pdb", f"{DATA}/184l_lig.sdf"),
    "3rod": (f"{DATA}/3rod_rec.pdb", f"{DATA}/3rod_lig.pdb"),
}


def main():
    import numpy as np

    from gnina_tpu.chem import ingest
    from gnina_tpu.docking import DockingEngine, DockSettings
    from scripts.quality_gate import top1_rmsd

    name = os.environ.get("FIXTURE", "184l")
    budgets = [int(b) for b in
               os.environ.get("BUDGETS", "16,20,24").split(",")]
    seeds = [int(s) for s in os.environ.get("SEEDS", "1,2,3").split(",")]
    steps = int(os.environ.get("STEPS", "512"))
    copies = int(os.environ.get("COPIES", "8"))
    windows = [int(w) for w in os.environ.get("WINDOWS", "0").split(",")]
    # PATH=xla: probe the XLA path instead (STRIDE sweeps refine_stride,
    # the in-loop full-v refinement cadence) — the reverse-causality A/B
    # for the fused path's once-per-window refine cadence
    path = os.environ.get("PATH_MODE", "fused")
    strides = [int(x) for x in os.environ.get("STRIDE", "8").split(",")]

    rec_path, lig_path = FIXTURES[name]
    rec = ingest.Receptor.from_file(rec_path)
    lig = list(ingest.iter_ligands(lig_path))[0]
    center, size = ingest.autobox_ligand(lig_path)

    if path == "xla":
        combos = [dict(fused_search="off", refine_stride=st)
                  for st in strides]
    else:
        refines = [int(x) for x in
                   os.environ.get("REFINE", "0").split(",")]
        combos = []
        for budget in budgets:
            for window in windows:
                for refine in refines:
                    kw = dict(fused_search="on",
                              fused_mc_tick_budget=budget)
                    if window:
                        kw["fused_mc_steps"] = window
                    if refine:
                        kw["fused_refine_every"] = refine
                    combos.append(kw)
    for kw in combos:
        succ = 0
        total = 0
        means = []
        wall = 0.0
        for seed in seeds:
            eng = DockingEngine(DockSettings(
                cnn_scoring="none", seed=seed, num_mc_steps=steps,
                exhaustiveness=8, **kw))
            t0 = time.time()
            res = eng.dock_batch(rec, [lig] * copies, center, size,
                                 seed=seed)
            wall += time.time() - t0
            rms = [top1_rmsd(lig, rr) for rr in res]
            succ += sum(1 for r in rms if r < 2.0)
            total += len(rms)
            means.append(float(np.mean(
                [rr[0].energy for rr in res if rr])))
        print(json.dumps({
            "fixture": name, "steps": steps, **kw,
            "rmsd_success": succ, "rmsd_n": total,
            "mean_best": round(float(np.mean(means)), 3),
            "wall_s": round(wall, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
