"""Time the fused BFGS kernel on the real TPU.

Env: KP_LANES (default 128: 16 ligand copies x exh 8), KP_ITERS (19),
KP_REPS (8 on-device repetitions via chained calls).
"""

import json
import os
import sys
import time

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

    lanes = int(os.environ.get("KP_LANES", "128"))
    iters = int(os.environ.get("KP_ITERS", "19"))
    reps = int(os.environ.get("KP_REPS", "8"))

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    lig_d, rec_d, box, max_layers, _n = eng._prepare(rec, lig, center, size)

    n_ligs = max(1, lanes // 8)
    pack = pd.build_pack([lig] * n_ligs, np.asarray(rec_d.coords),
                         np.asarray(rec_d.types), np.asarray(rec_d.charges),
                         np.asarray(rec_d.mask), 8, eng.sf.table)
    fused = pd.FusedBfgs(eng.sf, pack, maxiters=iters, want_metro=True,
                         interpret=False)
    l_pad = pack.lc.shape[-1]
    t = lig_d.num_torsion_slots
    keys = jax.random.split(jax.random.PRNGKey(0), reps * l_pad)
    confs = jax.vmap(lambda k: mc.randomize_conf(
        k, lig_d, box.lo, box.hi, t))(keys)
    rigid, tors = pd.conf_to_packed(confs, fused.m)
    # every rep minimizes a FRESH random batch (chaining outputs makes
    # later reps trivially cheap: converged poses exit in 1-2 iterations)
    rigid = rigid.reshape(8, reps, l_pad).transpose(1, 0, 2)
    tors = tors.reshape(fused.m, reps, l_pad).transpose(1, 0, 2)
    scal = fused.scal(10.0, 10.0, 1e3, 1000.0, box.lo, box.hi)

    @jax.jit
    def run(rigid_all, tors_all):
        def body(i, acc):
            org, otr, stats, _ = fused(rigid_all[i], tors_all[i], scal)
            return acc + stats[0:1, :].sum()

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.time()
    out = run(rigid, tors)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(rigid, tors)
    jax.block_until_ready(out)
    dt = time.time() - t0
    per_bfgs = dt / reps
    # one more single call for the energy sanity
    org, otr, stats, coords = fused(rigid[0], tors[0], scal)
    f = np.asarray(stats[0, :8])
    trials = float(np.asarray(stats[2, 0]))
    iters_used = float(np.asarray(stats[3, 0]))
    print(json.dumps({
        "lanes": l_pad, "iters": iters, "compile_s": round(compile_s, 1),
        "ms_per_bfgs": round(1000 * per_bfgs, 2),
        "ms_per_bfgs_per_64lanes": round(1000 * per_bfgs * 64 / l_pad, 2),
        "f_sample": [round(float(x), 2) for x in f[:4]],
        "ls_trials_total": trials, "bfgs_iters_used": iters_used,
        "avg_trials_per_iter": round(trials / max(iters_used, 1), 2),
    }))


if __name__ == "__main__":
    main()
