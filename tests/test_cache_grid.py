"""Grid-cache (search accelerator) correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.docking import DockingEngine, DockSettings
from gnina_tpu.ops import cache_grid as cg
from gnina_tpu.ops import fk
from gnina_tpu.ops.energy import make_energy_fn
from gnina_tpu.types import initial_conf

pytestmark = pytest.mark.slow  # compiles big device programs

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def system():
    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    center = lig.orig_coords.mean(axis=0)
    size = np.full(3, 14.0, np.float32)
    lig_d, rec_d, box, max_layers, _ = eng._prepare(rec, lig, center, size)
    grids = eng._populate_cache([lig], rec_d, np.asarray(box.lo),
                                np.asarray(box.hi))
    return eng, lig, lig_d, rec_d, box, max_layers, grids


@pytest.mark.smoke
def test_grid_matches_analytic_within_trilinear_error(system):
    eng, lig, lig_d, rec_d, box, max_layers, grids = system
    efn = make_energy_fn(eng.sf, max_layers)
    conf = initial_conf(lig, lig_d.num_torsion_slots)
    coords = fk.fk_coords(lig_d, conf, max_layers)
    e_exact = float(efn.eval_inter(lig_d, rec_d, conf, box, 1e3,
                                   jnp.float32(1000.0)))
    e_grid = float(cg.cache_inter_energy(grids, coords, lig_d.types,
                                         lig_d.charges, lig_d.heavy_mask,
                                         1e3, jnp.float32(1000.0)))
    # 0.375-A trilinear discretization error — same magnitude the reference
    # accepts for its search grids
    assert abs(e_exact - e_grid) < 2.0
    assert e_grid < -3.0  # still clearly favorable


def test_grid_gradient_finite_differences(system):
    eng, lig, lig_d, rec_d, box, max_layers, grids = system

    def f(coords):
        return cg.cache_inter_energy(grids, coords, lig_d.types,
                                     lig_d.charges, lig_d.heavy_mask,
                                     1e3, jnp.float32(1000.0))

    conf = initial_conf(lig, lig_d.num_torsion_slots)
    coords = np.asarray(fk.fk_coords(lig_d, conf, max_layers))
    g = np.asarray(jax.grad(f)(jnp.asarray(coords)))
    assert np.all(np.isfinite(g))
    h = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(4):
        i = rng.randint(lig.num_atoms)
        ax = rng.randint(3)
        cp = coords.copy()
        cp[i, ax] += h
        cm = coords.copy()
        cm[i, ax] -= h
        fd = (float(f(jnp.asarray(cp))) - float(f(jnp.asarray(cm)))) / (2 * h)
        # trilinear is piecewise linear: fd == grad unless straddling a cell
        # boundary; allow a loose bound
        assert abs(g[i, ax] - fd) < max(0.3 * abs(fd), 0.5), (i, ax, g[i, ax], fd)


def test_out_of_box_penalty_gradient(system):
    eng, lig, lig_d, rec_d, box, max_layers, grids = system

    def f(coords):
        return cg.cache_inter_energy(grids, coords, lig_d.types,
                                     lig_d.charges, lig_d.heavy_mask,
                                     1e3, jnp.float32(1000.0))

    conf = initial_conf(lig, lig_d.num_torsion_slots)
    coords = np.array(fk.fk_coords(lig_d, conf, max_layers))  # writable copy
    # pick a HEAVY atom: noelem's atom 0 is the no-element `*` atom the
    # reference ignores (typed Hydrogen, excluded from every term —
    # PDBQTUtilities.cpp:402-427 semantics), so its gradient is rightly 0
    a = int(np.argmax(np.asarray(lig_d.heavy_mask)))
    coords[a] = np.asarray(box.hi) + 3.0  # push the atom far out
    g = np.asarray(jax.grad(f)(jnp.asarray(coords)))
    # out-of-box: gradient = +slope per overflowing axis (grid.cpp:180)
    assert np.allclose(g[a], 1e3, rtol=1e-3)
