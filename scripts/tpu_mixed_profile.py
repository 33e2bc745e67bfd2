"""Localize the heterogeneous-screen slowdown (VERDICT r4 weak #2).

BENCH_r04 measured the mixed screen (10gs+184l+3rod x5 via the CLI) at
~0.17 lig/s vs 3.7 on the homogeneous 16x10gs batch at the same step
count, and a CPU run shows host chemistry is ~2 s — the gap is device
work.  This probe runs each bucket's dock_batch DIRECTLY (no CLI) with
GNINA_TPU_PROFILE phase ticks, so the per-bucket init/chunk/stage/fetch
split is visible, then runs the CLI screen for the end-to-end number.

Usage (on the chip): python scripts/tpu_mixed_profile.py
Env: STEPS (default 1024), COPIES (default 5), SKIP_CLI=1
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("GNINA_TPU_PROFILE", "1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = "/root/reference/test/gnina/data"


def main():
    from gnina_tpu.chem import ingest
    from gnina_tpu.chem.sdf import write_sdf_block
    from gnina_tpu.docking import DockingEngine, DockSettings

    steps = int(os.environ.get("STEPS", "1024"))
    copies = int(os.environ.get("COPIES", "5"))

    rec = ingest.Receptor.from_file(f"{DATA}/10gs_rec.pdb")
    center, size = ingest.autobox_ligand(f"{DATA}/10gs_lig.sdf")
    mols = {}
    for path in (f"{DATA}/10gs_lig.sdf", f"{DATA}/184l_lig.sdf",
                 f"{DATA}/3rod_lig.pdb"):
        m = list(ingest.iter_ligands(path))[0]
        mols[os.path.basename(path)] = m

    # per-bucket direct dock_batch with profile ticks (canonical shapes
    # ON to match the CLI screen path)
    eng = DockingEngine(DockSettings(
        cnn_scoring="none", seed=42, num_mc_steps=steps,
        canonical_shapes=True))
    for name, lig in mols.items():
        batch = [lig] * copies
        t0 = time.time()
        eng.dock_batch(rec, batch, center, size, seed=42)
        first = time.time() - t0
        t0 = time.time()
        res = eng.dock_batch(rec, batch, center, size, seed=43)
        el = time.time() - t0
        print(json.dumps({
            "bucket": name, "n": copies, "atoms": lig.num_atoms,
            "nodes": lig.num_nodes, "first_s": round(first, 2),
            "wall_s": round(el, 2), "lig_per_s": round(copies / el, 3),
            "best": round(res[0][0].energy, 3) if res and res[0] else None,
        }), flush=True)

    if os.environ.get("SKIP_CLI") == "1":
        return

    # end-to-end CLI screen (same shape-bucket pipeline the bench uses)
    from gnina_tpu import cli

    with tempfile.TemporaryDirectory() as td:
        mixed = os.path.join(td, "mixed.sdf")
        with open(mixed, "w") as f:
            for ci in range(copies):
                for m in mols.values():
                    f.write(write_sdf_block(m, name=f"{m.name}_{ci}"))
        outp = os.path.join(td, "screen.sdf")
        argv = ["-r", f"{DATA}/10gs_rec.pdb", "-l", mixed,
                "--autobox_ligand", f"{DATA}/10gs_lig.sdf",
                "--cnn_scoring", "none", "--num_mc_steps", str(steps),
                "--seed", "42", "-o", outp, "--verbosity", "2"]
        t0 = time.time()
        rc = cli.main(argv)
        first = time.time() - t0
        t0 = time.time()
        rc = cli.main(argv)
        el = time.time() - t0
        n = copies * len(mols)
        print(json.dumps({
            "cli_screen": True, "n": n, "rc": rc,
            "first_s": round(first, 2), "wall_s": round(el, 2),
            "lig_per_s": round(n / el, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
