"""REAL multi-host rendezvous: two CPU processes, one coordinator.

Unlike test_dist_screen.py (which stubs multihost.init because two ranks
cannot rendezvous in one process), this launches two actual subprocesses
that initialize jax.distributed against a localhost coordinator, dock
their round-robin ligand slices, hit the end-of-screen barrier, and let
rank 0 merge the part files — the full production multi-host path.
"""

import os
import socket
import subprocess
import sys

import pytest

DATA = "/root/reference/test/gnina/data"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # two subprocesses, each compiles a program


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.smoke
def test_real_rendezvous_screen(tmp_path):
    from gnina_tpu.chem import sdf

    mols = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))
    with open(f"{DATA}/noelem.sdf") as f:
        block = f.read()
    lig_file = str(tmp_path / "ligs.sdf")
    with open(lig_file, "w") as f:
        for i in range(3):
            f.write(block.replace(mols[0].name, f"lig_{i}", 1))

    outfile = str(tmp_path / "screen.sdf")
    port = _free_port()
    base = [
        sys.executable, "-m", "gnina_tpu",
        "-r", f"{DATA}/noelem_rec.pdb", "-l", lig_file,
        "--autobox_ligand", f"{DATA}/noelem.sdf",
        "--cnn_scoring", "none", "--num_mc_steps", "4",
        "--exhaustiveness", "1", "--num_mc_saved", "2", "--num_modes", "1",
        # NOT -q: the final assertion reads rank 0's merge log line,
        # which quiet mode rightly suppresses
        "--seed", "5", "-o", outfile,
        "--dist_nprocs", "2",
        "--dist_coordinator", f"127.0.0.1:{port}",
    ]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # pure-CPU subprocesses
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

    procs = [subprocess.Popen(base + ["--dist_procid", str(pid)],
                              cwd=ROOT, env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    text = open(outfile).read()
    p0, p1, p2 = (text.find(f"lig_{i}") for i in range(3))
    assert 0 <= p0 < p1 < p2, text[:500]
    assert text.count("$$$$") == 3
    # rank 0 logged the real merge after the distributed barrier
    assert "Merged 3 ligand(s) from 2 host part files" in outs[0]
