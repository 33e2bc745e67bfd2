"""Metropolis/container bookkeeping micro-tests on a synthetic objective.

Pins the energy-bookkeeping semantics of the MC loop against the reference
(monte_carlo.cpp:99-148 + update_energy:44-47):
- the chain/container energies are ig_metropolis evaluations (the
  metro_on_coords contract), NOT the BFGS objective;
- step 0 always accepts;
- saved containers are consistent: best_e == min(container energy);
- stride-gated refinement only improves container energies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnina_tpu.chem import sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.ops import fk, mc
from gnina_tpu.ops.bfgs import MinimizeParams
from gnina_tpu.types import pad_ligand

from __graft_entry__ import _TINY_LIG_SDF

TARGET = jnp.asarray(np.array([1.0, 2.0, -1.0], np.float32))


@pytest.fixture(scope="module")
def lig_d():
    mol = list(sdf.iter_sdf(_TINY_LIG_SDF, is_text=True))[0]
    lig = build_tree_from_molecule(mol)
    n = ((lig.num_atoms + 7) // 8) * 8
    m = ((lig.num_nodes + 3) // 4) * 4
    return lig, pad_ligand(lig, n, m, 32)


def _energy_fns(lig_data, max_layers):
    """Harmonic well pulling the heavy centroid to TARGET."""

    def well_on_coords(coords):
        cnt = jnp.maximum(jnp.sum(lig_data.heavy_mask), 1)
        cen = jnp.sum(jnp.where(lig_data.heavy_mask[:, None], coords, 0.0),
                      axis=0) / cnt
        return jnp.sum((cen - TARGET) ** 2)

    def value(conf, v):
        return well_on_coords(fk.fk_coords(lig_data, conf, max_layers))

    def deriv(conf, v):
        t = conf.torsions.shape[-1]

        def f(eps):
            return value(fk.conf_with_increment_var(conf, eps), v)

        return jax.value_and_grad(f)(jnp.zeros((6 + t,), jnp.float32))

    # metropolis energy deliberately OFFSET from the BFGS objective so the
    # test detects which one lands in the container
    def metro(coords):
        return well_on_coords(coords) + 100.0

    return {"eval_deriv": deriv, "eval_energy": value,
            "metro_on_coords": metro}


@pytest.mark.parametrize("stride", [0, 1, 4])
def test_container_bookkeeping(lig_d, stride):
    lig, lig_data = lig_d
    max_layers = max(int(lig.layer.max()), 1)
    params = mc.MCParams(num_steps=16, num_saved_mins=5,
                         minparams=MinimizeParams(maxiters=5),
                         refine_stride=stride)
    fns = _energy_fns(lig_data, max_layers)
    t = lig_data.num_torsion_slots
    dof_mask = jnp.arange(6 + t) < 6 + lig.num_torsions

    key = jax.random.PRNGKey(0)
    carry = mc.mc_init(key, lig_data, params, jnp.full(3, -4.0),
                       jnp.full(3, 4.0), max_layers)
    final = mc.mc_chunk(carry, jax.random.fold_in(key, 1), 16, lig_data,
                        fns, params, max_layers, dof_mask,
                        lig.num_torsions)

    energies = np.asarray(final.cont.energy)
    valid = energies < 1e9
    assert valid.any(), "nothing saved after 16 steps"
    # metropolis energies (offset +100) are what lands in the container —
    # the harmonic well is small near the target so values sit near 100
    assert energies[valid].min() > 50.0
    assert energies[valid].min() < 200.0
    # best_e tracks the container minimum
    assert np.isclose(float(final.best_e), energies[valid].min(), atol=1e-4)
    # chain energy equals the metro eval at the chain conf
    e_chain = float(fns["metro_on_coords"](
        fk.fk_coords(lig_data, jax.tree_util.tree_map(jnp.asarray,
                                                      final.conf),
                     max_layers)))
    assert np.isclose(float(final.e), e_chain, rtol=1e-4, atol=1e-3)


def test_first_step_always_accepts(lig_d):
    lig, lig_data = lig_d
    max_layers = max(int(lig.layer.max()), 1)
    params = mc.MCParams(num_steps=1, num_saved_mins=3,
                         minparams=MinimizeParams(maxiters=2),
                         refine_stride=0)
    fns = _energy_fns(lig_data, max_layers)
    t = lig_data.num_torsion_slots
    dof_mask = jnp.arange(6 + t) < 6 + lig.num_torsions
    carry = mc.mc_init(jax.random.PRNGKey(5), lig_data, params,
                       jnp.full(3, -4.0), jnp.full(3, 4.0), max_layers)
    assert float(carry.e) >= 1e9  # MAX_FL sentinel before the first step
    final = mc.mc_chunk(carry, jax.random.PRNGKey(6), 1, lig_data, fns,
                        params, max_layers, dof_mask, lig.num_torsions)
    assert float(final.e) < 1e9   # step 0 accepted unconditionally


def test_refinement_improves(lig_d):
    """stride=1 (refine every step, reference cadence) must end with a
    best_e no worse than stride=0 (no in-loop refinement) for the same
    seed/steps on a smooth objective."""
    lig, lig_data = lig_d
    max_layers = max(int(lig.layer.max()), 1)
    fns = _energy_fns(lig_data, max_layers)
    t = lig_data.num_torsion_slots
    dof_mask = jnp.arange(6 + t) < 6 + lig.num_torsions

    res = {}
    for stride in (0, 1):
        params = mc.MCParams(num_steps=8, num_saved_mins=4,
                             minparams=MinimizeParams(maxiters=4),
                             refine_stride=stride)
        carry = mc.mc_init(jax.random.PRNGKey(7), lig_data, params,
                           jnp.full(3, -4.0), jnp.full(3, 4.0), max_layers)
        final = mc.mc_chunk(carry, jax.random.PRNGKey(8), 8, lig_data, fns,
                            params, max_layers, dof_mask, lig.num_torsions)
        res[stride] = float(final.best_e)
    assert res[1] <= res[0] + 1e-5, res
