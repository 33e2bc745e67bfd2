"""Profile one compiled MC chunk on the TPU and print the top ops by time.

Usage: python scripts/tpu_trace.py  (env knobs as in tpu_probe.py)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings

    stride = int(os.environ.get("PROBE_STRIDE", "4"))
    fused = bool(int(os.environ.get("PROBE_FUSED", "1")))
    steps = int(os.environ.get("PROBE_STEPS", "64"))
    batch = int(os.environ.get("PROBE_BATCH", "8"))
    exh = int(os.environ.get("PROBE_EXH", "8"))

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")

    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=3, exhaustiveness=exh, num_mc_steps=steps,
        mc_chunk_steps=steps, refine_stride=stride, fused_line_search=fused))
    ligs = [lig] * batch
    # compile everything once
    eng.dock_batch(rec, ligs, center, size, seed=3)

    outdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        eng.dock_batch(rec, ligs, center, size, seed=4)

    # aggregate device-op durations from the trace
    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    tot = defaultdict(float)
    cnt = defaultdict(int)
    device_total = 0.0
    for fp in files:
        with gzip.open(fp, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e6  # seconds
            args = ev.get("args", {}) or {}
            # device ops have a 'long_name' or run on TPU pids; keep all X
            # events that look like XLA ops
            if "tid" in ev and dur > 0 and not name.startswith("$"):
                key = name.split(".")[0]
                tot[key] += dur
                cnt[key] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    print(f"{'op':60s} {'total_s':>9s} {'count':>8s}")
    for k, v in top:
        print(f"{k[:60]:60s} {v:9.3f} {cnt[k]:8d}")


if __name__ == "__main__":
    main()
