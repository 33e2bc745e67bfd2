"""Probe the three unmeasured CNN-path costs on the real chip (VERDICT r4 #1).

Measures, with compile excluded:
  1. batch voxelization throughput: grids/s at 28ch x 48^3, 0.5 A
     (BASELINE config 2; unit = torch_model.cpp:60-108's grid)
  2. CNN rescore pose-evals/s with the default 3-model ensemble
     (BASELINE config 3; cnn_torch_scorer.cpp:33-35)
  3. full dock at --cnn_scoring rescore, lig/s (BASELINE config 4)

Run: python scripts/tpu_cnn_probe.py [vox|rescore|dock|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402

DATA = "/root/reference/test/gnina/data"


def fixture():
    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/10gs_lig.sdf")
    return rec, lig, center, size


def probe_vox(batch=64):
    import jax
    import jax.numpy as jnp
    from gnina_tpu.models.registry import load_model
    from gnina_tpu.ops.voxelize import voxelize

    rec, lig, center, size = fixture()
    m = load_model("dense_1_3")
    nrec = m.rec_typer.num_channels
    rc = rec.coords
    # prune to box like scorer does
    margin = m.dimension / 2 + 4.0
    keep = np.all((rc >= center - margin) & (rc <= center + margin), axis=1)
    rc = rc[keep]; rt = rec.types[keep]
    k = max(((len(rt) + 255) // 256) * 256, 256)
    pad = k - len(rt)
    rc = np.pad(rc, ((0, pad), (0, 0))).astype(np.float32)
    rt = np.pad(rt, (0, pad))
    rmask = np.pad(np.ones(k - pad, bool), (0, pad))
    rec_chan = np.asarray(m.rec_typer.table)[rt]
    rec_radii = np.asarray(m.rec_typer.radii)[rt]
    lt = lig.types
    lig_chan = np.asarray(m.lig_typer.table)[lt]
    lig_chan = np.where(lig_chan >= 0, lig_chan + nrec, -1)
    lig_radii = np.asarray(m.lig_typer.radii)[lt]
    n = len(lt)
    npad = ((n + 7) // 8) * 8
    coords0 = np.asarray(lig.orig_coords, np.float32)

    allc = np.concatenate([rc, np.pad(coords0, ((0, npad - n), (0, 0)))])
    chans = np.concatenate([rec_chan, np.pad(lig_chan, (0, npad - n),
                                             constant_values=-1)])
    radii = np.concatenate([rec_radii, np.pad(lig_radii, (0, npad - n))])
    mask = np.concatenate([rmask, np.pad(np.ones(n, bool), (0, npad - n))])
    A = allc.shape[0]
    # batch of poses: jitter ligand coords
    rng = np.random.RandomState(0)
    allc_b = np.tile(allc, (batch, 1, 1))
    allc_b[:, k:] += rng.randn(batch, npad, 3).astype(np.float32) * 0.5
    centers = np.tile(np.asarray(center, np.float32), (batch, 1))

    fn = jax.jit(jax.vmap(lambda c, ctr: voxelize(
        c, jnp.asarray(chans), jnp.asarray(radii), jnp.asarray(mask), ctr,
        num_channels=m.num_channels, npoints=m.grid_points,
        resolution=m.resolution, radius_scale=m.radius_scale)))
    # reduce on-device and fetch ONE scalar: through the axon tunnel,
    # block_until_ready on a never-fetched output can return before the
    # remote execution drains, under-reporting wall by orders of magnitude.
    # reps are chained INSIDE one jit (input perturbed per iteration so XLA
    # cannot CSE them away) so the ~0.25 s tunnel round trip is paid once.
    reps = 10

    def repeated(a, c):
        def body(i, acc):
            return acc + fn(a + 1e-4 * i, c).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    red = jax.jit(repeated)
    x = jnp.asarray(allc_b); ctr = jnp.asarray(centers)
    t0 = time.time(); float(red(x, ctr))
    compile_s = time.time() - t0
    t0 = time.time()
    float(red(x, ctr))
    el = (time.time() - t0) / reps
    print(f"VOX: batch={batch} A={A} ch={m.num_channels} n={m.grid_points} "
          f"compile={compile_s:.1f}s run={el*1e3:.1f}ms "
          f"-> {batch/el:.1f} grids/s")
    return batch / el


def probe_rescore(poses=128):
    from gnina_tpu.models.scorer import CNNScorer
    rec, lig, center, size = fixture()
    sc = CNNScorer(["default"])  # 3-model default ensemble
    rng = np.random.RandomState(0)
    coords = np.tile(np.asarray(lig.orig_coords, np.float32), (poses, 1, 1))
    coords += rng.randn(*coords.shape).astype(np.float32) * 0.5
    t0 = time.time()
    out = sc.score_poses(rec, lig, coords)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = sc.score_poses(rec, lig, coords)
    el = (time.time() - t0) / reps
    # pose-evals = poses x models (x rotations=1)
    pe = poses * len(sc.models) / el
    print(f"RESCORE: poses={poses} models={len(sc.models)} "
          f"compile={compile_s:.1f}s run={el*1e3:.0f}ms "
          f"-> {poses/el:.1f} poses/s ({pe:.1f} pose-evals/s) "
          f"score[0]={out[0][0]:.3f}")
    return poses / el


def probe_dock(batch=16, steps=1024):
    from gnina_tpu.docking import DockingEngine, DockSettings
    from gnina_tpu.models.scorer import CNNScorer
    rec, lig, center, size = fixture()
    eng = DockingEngine(DockSettings(cnn_scoring="rescore", seed=42,
                                     num_mc_steps=steps),
                        cnn_scorer=CNNScorer(["default"]))
    ligs = [lig] * batch
    t0 = time.time()
    eng.dock_batch(rec, ligs, center, size, seed=42)
    first = time.time() - t0
    t0 = time.time()
    res = eng.dock_batch(rec, ligs, center, size, seed=43)
    el = time.time() - t0
    r0 = res[0][0]
    print(f"DOCK+RESCORE: batch={batch} steps={steps} first={first:.1f}s "
          f"run={el:.2f}s -> {batch/el:.3f} lig/s "
          f"best={r0.energy:.3f} cnnscore={r0.cnnscore:.3f}")
    return batch / el


def probe_conv(poses=128):
    """Ensemble conv3d forward alone (no voxelization) on random grids."""
    import jax
    import jax.numpy as jnp
    from gnina_tpu.models import runtime
    from gnina_tpu.models.registry import load_model

    names = ["dense_1_3", "dense_1_3_PT_KD_3", "crossdock_default2018_KD_4"]
    models = [load_model(n) for n in names]
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.rand(poses, models[0].num_channels,
                             models[0].grid_points, models[0].grid_points,
                             models[0].grid_points).astype(np.float32))

    @jax.jit
    def fwd(grids):
        tot = 0.0
        for m in models:
            outs = runtime.execute(m.spec, m.params, grids)
            tot = tot + sum(jnp.sum(o) for o in outs)
        return tot

    t0 = time.time(); float(fwd(g)); compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        float(fwd(g))
    el = (time.time() - t0) / reps
    print(f"CONV: poses={poses} models=3 compile={compile_s:.1f}s "
          f"run={el*1e3:.0f}ms -> {poses/el:.1f} poses/s")
    return poses / el


def probe_voxw(batch=128):
    """Windowed receptor voxelization alone at the rescore shape."""
    import jax
    import jax.numpy as jnp
    from gnina_tpu.models.registry import load_model
    from gnina_tpu.ops.voxelize import slab_window_size, voxelize_windowed

    rec, lig, center, size = fixture()
    m = load_model("dense_1_3")
    rc = rec.coords
    margin = m.dimension / 2 + 4.0
    keep = np.all((rc >= center - margin) & (rc <= center + margin), axis=1)
    rc = rc[keep]; rt = rec.types[keep]
    k = max(((len(rt) + 255) // 256) * 256, 256)
    pad = k - len(rt)
    mask = np.pad(np.ones(k - pad, bool), (0, pad))
    rc = np.pad(rc, ((0, pad), (0, 0))).astype(np.float32)
    rt = np.pad(rt, (0, pad))
    sx = np.where(mask, rc[:, 0], np.float32(1e9))
    order = np.argsort(sx, kind="stable")
    rc, rt, mask = rc[order], rt[order], mask[order]
    chan = np.asarray(m.rec_typer.table)[rt]
    radii = np.asarray(m.rec_typer.radii)[rt]
    reach = 1.5 * float(np.max(m.rec_typer.radii)) * m.radius_scale + \
        m.resolution
    win = slab_window_size(np.where(mask, rc[:, 0], 1e9), reach)
    centers = np.tile(np.asarray(center, np.float32), (batch, 1))
    centers += np.random.RandomState(0).randn(batch, 3).astype(np.float32)

    fn = jax.jit(lambda ctrs: jax.vmap(lambda c: voxelize_windowed(
        jnp.asarray(rc), jnp.asarray(chan), jnp.asarray(radii),
        jnp.asarray(mask), c, num_channels=m.num_channels, window=win,
        npoints=m.grid_points, resolution=m.resolution,
        radius_scale=m.radius_scale))(ctrs).sum())
    c = jnp.asarray(centers)
    t0 = time.time(); float(fn(c)); compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        float(fn(c))
    el = (time.time() - t0) / reps
    print(f"VOXW: batch={batch} k={k} win={win} compile={compile_s:.1f}s "
          f"run={el*1e3:.0f}ms -> {batch/el:.1f} grids/s")
    return batch / el


def run_all():
    """All three probes -> one record for bench.py's cnn_paths detail."""
    vox = probe_vox()
    rescore = probe_rescore()
    dock = probe_dock()
    return {
        "voxelization_grids_per_s": round(vox, 1),
        "vox_config": "28ch 48^3 grid @0.5A, 10gs pocket, batch 64",
        "rescore_poses_per_s": round(rescore, 1),
        "rescore_config": "default 3-model ensemble, 128 poses, 10gs",
        "dock_rescore_lig_per_s": round(dock, 4),
        "dock_rescore_config": "10gs redock x16, 1024 MC steps, "
                               "--cnn_scoring rescore (default ensemble)",
    }


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what == "all":
        import json
        print(json.dumps(run_all()))
    else:
        if what == "vox":
            probe_vox()
        if what == "voxw":
            probe_voxw()
        if what == "conv":
            probe_conv()
        if what == "rescore":
            probe_rescore()
        if what == "dock":
            probe_dock()
