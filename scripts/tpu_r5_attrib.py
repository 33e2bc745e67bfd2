"""Per-tick cost attribution for the async-MC fused kernel (VERDICT r5 #3).

The tick loop's cost candidates: the KB-blocked receptor pair loop
(scales with K_PAD), FK forward+backward (scales with nodes/atoms), the
completion-indexed stream writes (scale with S), and BFGS bookkeeping.
Timing the SAME window at different receptor paddings isolates the pair
loop's share: slope = pair cost per KB tile, intercept = everything else.

One config per process (the XLA cache does not fully capture Pallas
programs across processes):

    K_PAD=512  python scripts/tpu_r5_attrib.py
    K_PAD=1024 python scripts/tpu_r5_attrib.py
    K_PAD=2048 python scripts/tpu_r5_attrib.py
    S=128 K_PAD=1024 STREAM=0 ... (with GNINA_TPU_NO_STREAM kernel hack)

Prints one JSON line with wall seconds and per-tick microseconds.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings
    from gnina_tpu.ops import mc
    from gnina_tpu.ops import pallas_dock as pd

    k_pad = int(os.environ.get("K_PAD", "1024"))
    steps = int(os.environ.get("S", "128"))
    budget = int(os.environ.get("BUDGET", "16"))
    maxiters = int(os.environ.get("ITERS", "19"))
    warm = os.environ.get("WARM", "1") == "1"

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    lig_d, rec_d, box, max_layers, _n = eng._prepare(rec, lig, center, size)

    pruned = rec.pruned(np.asarray(center), np.asarray(size) / 2,
                        margin=eng.sf.cutoff)
    kr = len(pruned.types)
    # order receptor rows by distance to box center so a TRUNCATED pad
    # keeps the nearest atoms (timing probe; energies at k<kr are wrong
    # but the tick cost is the measurement)
    order = np.argsort(((pruned.coords - np.asarray(center)) ** 2).sum(1))
    keep = min(kr, k_pad)
    rc = np.zeros((k_pad, 3), np.float32)
    rt = np.zeros((k_pad,), np.int32)
    rq = np.zeros((k_pad,), np.float32)
    rm = np.zeros((k_pad,), np.float32)
    sel = order[:keep]
    rc[:keep] = pruned.coords[sel]
    rt[:keep] = pruned.types[sel]
    rq[:keep] = pruned.charges[sel]
    rm[:keep] = 1.0

    ligs = [lig] * 16
    pack = pd.build_pack(ligs, rc, rt, rq, rm, 8, eng.sf.table)
    n_hvy = lig.num_atoms  # all heavy in 10gs
    fused = pd.FusedBfgs(eng.sf, pack, maxiters=maxiters, want_metro=True,
                         n_iter=n_hvy, mc_steps=steps, num_trials=10,
                         ls_factor=2.0, async_mc=True, tick_budget=budget,
                         warm_ls=warm)

    l_pad = pack.lc.shape[-1]
    t = lig_d.num_torsion_slots
    keys = jax.random.split(jax.random.PRNGKey(0), l_pad)
    confs = jax.vmap(lambda kk: mc.randomize_conf(
        kk, lig_d, box.lo, box.hi, t))(keys)
    rigid, tors = pd.conf_to_packed(confs, fused.m)
    scal = fused.scal(10.0, 10.0, 1e3, 1000.0, box.lo, box.hi)
    ecur = jnp.full((1, l_pad), 1e9, jnp.float32)

    @jax.jit
    def run(rg, tr, seed):
        org, otr, stats, _c, _sr, _st, _ss = fused.run_mc(
            rg, tr, scal, seed, ecur)
        return org, otr, stats

    t0 = time.time()
    org, otr, stats = run(rigid, tors, 1)
    float(jnp.sum(stats))
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for i in range(reps):
        org, otr, stats = run(rigid, tors, 2 + i)
    stats = np.asarray(stats)
    el = (time.time() - t0) / reps
    evals = stats[2]          # per-lane eval count == active ticks
    ticks = float(evals.max())
    stepc = stats[4]
    out = {
        "warm_ls": warm, "k_pad": k_pad, "kb_tiles": k_pad // 128, "steps": steps,
        "budget": budget, "wall_s": round(el, 3),
        "ticks": int(ticks), "us_per_tick": round(el / ticks * 1e6, 1),
        "mean_steps_done": round(float(stepc.mean()), 1),
        "steps_per_s_per_lane": round(float(stepc.mean()) / el, 1),
        "mean_best_e": round(float(np.asarray(stats)[0].min()), 3),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
