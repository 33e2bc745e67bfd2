"""Benchmark driver: prints ONE JSON line with the headline metric.

Config: full redock of the 10gs fixture (reference test data) with the
Vina scoring function, default search effort (exhaustiveness=8, heuristic
MC steps), --cnn_scoring none.  Metric: ligands docked per second per chip.

vs_baseline is measured against the single-V100 gnina anchor used by
BASELINE.md (reference publishes no absolute numbers in-tree; we use
0.033 lig/s ~= 30 s/ligand for a drug-like redock on one V100, the widely
reported gnina wall time for this fixture class).
"""

import json
import os
import sys
import time

V100_LIGANDS_PER_SEC = 0.033

# persistent XLA compile cache: the metric is steady-state throughput, so
# don't re-pay multi-minute single-core compiles on every bench invocation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main():
    import numpy as np

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import DockingEngine, DockSettings

    data = "/root/reference/test/gnina/data"
    if not os.path.exists(data):
        data = os.path.join(os.path.dirname(__file__), "tests", "data")

    rec = ingest.Receptor.from_file(f"{data}/10gs_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/10gs_lig.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/10gs_lig.sdf")

    steps = int(os.environ.get("GNINA_TPU_BENCH_STEPS", "1024"))
    eng = DockingEngine(DockSettings(cnn_scoring="none", seed=42,
                                     num_mc_steps=steps))
    # 16 ligands x exhaustiveness 8 = 128 chains: exactly one lane block of
    # the fused Pallas kernel (ops/pallas_dock.py LB)
    batch = int(os.environ.get("GNINA_TPU_BENCH_BATCH", "16"))
    ligs = [lig] * batch

    # warm-up / compile
    t0 = time.time()
    results_b = eng.dock_batch(rec, ligs, center, size, seed=42)
    compile_and_run = time.time() - t0

    # timed run (compiled)
    t0 = time.time()
    results_b = eng.dock_batch(rec, ligs, center, size, seed=43)
    elapsed = time.time() - t0
    results = results_b[0]

    lps = batch / elapsed
    # normalize to the reference's default search effort so vs_baseline is
    # apples-to-apples: the heuristic step count for this ligand is ~28.7k
    # (main.cpp:449-456) while the bench runs `steps` per chain
    heuristic_steps = int(70 * 3 * (50 + lig.num_atoms
                                    + 10 * (6 + lig.num_torsions)) / 2)
    lps_default_effort = lps * steps / heuristic_steps
    out = {
        "metric": "ligands_docked_per_sec",
        "value": round(lps, 4),
        "unit": "ligand/s/chip",
        "vs_baseline": round(lps_default_effort / V100_LIGANDS_PER_SEC, 3),
        "detail": {
            "config": f"10gs redock x{batch} batch, vina, exhaustiveness=8, "
                      f"{steps} MC steps/chain, cnn=none",
            "wall_s": round(elapsed, 2),
            "first_call_s": round(compile_and_run, 2),
            "num_poses": len(results),
            "steps_per_chain": steps,
            "heuristic_steps": heuristic_steps,
            "lps_at_default_effort": round(lps_default_effort, 5),
            "best_affinity": round(results[0].energy, 3) if results else None,
        },
    }

    # MEASURED default-effort dock (r5): the extrapolated number above
    # charges the fixed per-dock overhead (h2d transfers, finish-phase
    # slope escalation, host assembly — ~2.5 s) 28x, because it scales the
    # 1024-step wall linearly to the 28.7k-step heuristic.  Docking at the
    # REAL default effort (num_mc_steps=0 -> main.cpp:449-456 heuristic)
    # amortizes that overhead and is the honest apples-to-apples number
    # against the reference's default invocation; it replaces the
    # extrapolation in lps_at_default_effort and vs_baseline.
    if os.environ.get("GNINA_TPU_BENCH_DEFAULT_EFFORT", "1") == "1":
        import signal

        class _DEWall(Exception):
            pass

        def _de_alarm(sig, frm):
            raise _DEWall()

        old_h = signal.signal(signal.SIGALRM, _de_alarm)
        # wall budget: a hang here must not take down the whole artifact
        signal.alarm(int(os.environ.get(
            "GNINA_TPU_BENCH_DEFAULT_EFFORT_WALL", "1500")))
        try:
            eng_de = DockingEngine(DockSettings(cnn_scoring="none", seed=42))
            t0 = time.time()
            eng_de.dock_batch(rec, ligs, center, size, seed=42)
            de_first = time.time() - t0
            t0 = time.time()
            de_res = eng_de.dock_batch(rec, ligs, center, size, seed=43)
            de_el = time.time() - t0
            de_lps = batch / de_el
            # top-1 heavy-atom RMSD vs the crystal pose (redock success;
            # all 10gs_lig atoms are heavy)
            de_rmsd = []
            for rr in de_res:
                if rr:
                    d = rr[0].coords[: lig.num_atoms] - lig.orig_coords
                    de_rmsd.append(float(np.sqrt(
                        (d * d).sum(axis=1).mean())))
            out["vs_baseline"] = round(de_lps / V100_LIGANDS_PER_SEC, 3)
            out["detail"]["lps_at_default_effort_extrapolated"] = \
                out["detail"]["lps_at_default_effort"]
            out["detail"]["lps_at_default_effort"] = round(de_lps, 5)
            out["detail"]["default_effort_measured"] = {
                "config": f"10gs redock x{batch} batch, heuristic "
                          f"{heuristic_steps} MC steps/chain "
                          "(num_mc_steps=0)",
                "wall_s": round(de_el, 2),
                "first_call_s": round(de_first, 2),
                "lig_per_s": round(de_lps, 5),
                "best_affinity": round(de_res[0][0].energy, 3)
                if de_res and de_res[0] else None,
                "rmsd_success": sum(1 for r in de_rmsd if r < 2.0),
                "rmsd_n": len(de_rmsd),
                "rmsd_min": round(min(de_rmsd), 2) if de_rmsd else None,
            }
        except _DEWall:
            out["detail"]["default_effort_measured"] = {
                "error": "wall budget exceeded; extrapolated number kept"}
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old_h)
    # recorded fused-vs-XLA search quality gate (scripts/tpu_path_parity.py
    # writes PATH_PARITY.json; re-run it whenever the kernel changes)
    pp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "PATH_PARITY.json")
    if os.path.exists(pp):
        with open(pp) as f:
            out["detail"]["path_parity"] = json.load(f)
    # multi-fixture multi-seed correctness gate (scripts/quality_gate.py,
    # the reference's test/gnina/correctness.py bar)
    qg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "QUALITY.json")
    if os.path.exists(qg):
        with open(qg) as f:
            q = json.load(f)
        out["detail"]["quality_gate"] = {
            "ok": q.get("ok"), "pearson_r": q.get("pearson_r"),
            "geometry_ok": q.get("geometry_ok"),
            "rmsd_success_fused": q.get("rmsd_success_fused"),
            "rmsd_success_xla": q.get("rmsd_success_xla"),
            "rmsd_total": q.get("rmsd_total"),
            "fused_settings": q.get("fused_settings"),
            "fixtures": {k: {"gap": v.get("gap"), "tol": v.get("tol"),
                             "ok": v.get("ok")}
                         for k, v in q.get("fixtures", {}).items()}}

    # heterogeneous screen config (VERDICT r3 item 9): mixed ligands
    # (10gs + 184l + 3rod) through the CLI screen path, so shape
    # bucketing, compile-ahead pipelining, and host chemistry overhead
    # show up in a measured number.  Default ON; disable with
    # GNINA_TPU_BENCH_MIXED=0.
    if os.environ.get("GNINA_TPU_BENCH_MIXED", "1") == "1":
        import tempfile

        from gnina_tpu import cli
        from gnina_tpu.chem.sdf import write_sdf_block

        copies = int(os.environ.get("GNINA_TPU_BENCH_MIXED_COPIES", "5"))
        mols = []
        for path in (f"{data}/10gs_lig.sdf", f"{data}/184l_lig.sdf",
                     f"{data}/3rod_lig.pdb"):
            m = list(ingest.iter_molecules(path))[0]
            mols.append(m)
        with tempfile.TemporaryDirectory() as td:
            mixed = os.path.join(td, "mixed.sdf")
            with open(mixed, "w") as f:
                for ci in range(copies):
                    for m in mols:
                        f.write(write_sdf_block(m, name=f"{m.name}_{ci}"))
            n_mixed = copies * len(mols)
            outp = os.path.join(td, "screen.sdf")
            argv = ["-r", f"{data}/10gs_rec.pdb", "-l", mixed,
                    "--autobox_ligand", f"{data}/10gs_lig.sdf",
                    "--cnn_scoring", "none", "--num_mc_steps", str(steps),
                    "--seed", "42", "-o", outp, "-q"]
            t0 = time.time()
            rc = cli.main(argv)
            first = time.time() - t0
            t0 = time.time()
            rc = cli.main(argv)
            el = time.time() - t0
            n_out = 0
            if rc == 0 and os.path.exists(outp):
                with open(outp) as f:
                    n_out = f.read().count("$$$$")
            out["detail"]["mixed_screen"] = {
                "config": f"10gs+184l+3rod x{copies} each ({n_mixed} ligs) "
                          f"vs 10gs_rec via CLI screen, {steps} MC steps",
                "wall_s": round(el, 2),
                "first_call_s": round(first, 2),
                "lig_per_s": round(n_mixed / el, 4),
                "rc": rc,
                "num_poses": n_out,
            }

    # optional secondary config (BASELINE.md config 5): a CNN-refinement
    # screen.  Gated by env because its compile adds minutes to the
    # default driver invocation; run with GNINA_TPU_BENCH_REFINE=1 and
    # record the result in ROADMAP.md.
    refine_path = os.environ.get(
        "GNINA_TPU_REFINE_BENCH_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "REFINE_BENCH.json"))
    if os.environ.get("GNINA_TPU_BENCH_REFINE") == "1":
        from gnina_tpu.models.scorer import CNNScorer

        rsteps = int(os.environ.get("GNINA_TPU_BENCH_REFINE_STEPS", "128"))
        engr = DockingEngine(
            DockSettings(cnn_scoring="refinement", seed=42,
                         num_mc_steps=rsteps),
            cnn_scorer=CNNScorer(["fast"]))
        t0 = time.time()
        engr.dock_batch(rec, ligs[:8], center, size, seed=42)
        first = time.time() - t0
        t0 = time.time()
        rres = engr.dock_batch(rec, ligs[:8], center, size, seed=43)
        el = time.time() - t0
        out["detail"]["refinement_screen"] = {
            "config": f"10gs x8 batch, --cnn_scoring refinement (fast), "
                      f"{rsteps} MC steps",
            "wall_s": round(el, 2),
            "first_call_s": round(first, 2),
            "lig_per_s": round(8 / el, 4),
            "best_cnn_score": round(max(
                r.cnnscore for rr in rres for r in rr), 4) if rres else None,
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        try:
            with open(refine_path, "w") as f:
                json.dump(out["detail"]["refinement_screen"], f, indent=1)
        except OSError:
            pass  # read-only checkout: the measurement still prints
    else:
        # embed the last recorded measurement (BASELINE.md config 5) so the
        # default driver invocation carries it without paying the compile.
        # Explicitly tagged cached (ADVICE r4): a default bench snapshot
        # must not pass a stale record off as a fresh measurement.
        if os.path.exists(refine_path):
            with open(refine_path) as f:
                rec_cached = json.load(f)
            rec_cached["cached"] = True
            out["detail"]["refinement_screen_cached"] = rec_cached

    # CNN-path measurements (BASELINE configs 2-4; VERDICT r4 item 1):
    # same cache-or-measure discipline.  GNINA_TPU_BENCH_CNN=1 measures on
    # the chip and records CNN_BENCH.json; default invocations embed the
    # last record tagged cached=true.
    cnn_path = os.environ.get(
        "GNINA_TPU_CNN_BENCH_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "CNN_BENCH.json"))
    if os.environ.get("GNINA_TPU_BENCH_CNN") == "1":
        from scripts.tpu_cnn_probe import run_all as _cnn_run_all

        cnn_rec = _cnn_run_all()
        cnn_rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        out["detail"]["cnn_paths"] = cnn_rec
        try:
            with open(cnn_path, "w") as f:
                json.dump(cnn_rec, f, indent=1)
        except OSError:
            pass
    elif os.path.exists(cnn_path):
        with open(cnn_path) as f:
            cnn_cached = json.load(f)
        cnn_cached["cached"] = True
        out["detail"]["cnn_paths_cached"] = cnn_cached
    print(json.dumps(out))


if __name__ == "__main__":
    main()
