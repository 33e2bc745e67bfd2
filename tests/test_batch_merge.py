"""Unit tests for mc.batch_merge_candidates — the one-pass device-native
replacement for the sequential add_to_output_container chain
(coords.cpp:43-56).  Semantics checked: greedy energy-ordered RMSD dedup,
empty-slot conventions, and agreement with the sequential reference
implementation on the quantities that matter (best pose, mutual diversity).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnina_tpu.constants import MAX_FL
from gnina_tpu.ops import mc
from gnina_tpu.types import Conf


N_ATOMS = 8
T = 2


def _pose(rng, base=None, jitter=0.0, energy=0.0):
    """(energy, conf, coords) with optional jitter around a base pose."""
    if base is None:
        coords = rng.uniform(-10, 10, size=(N_ATOMS, 3)).astype(np.float32)
    else:
        coords = base + rng.normal(0, jitter, size=(N_ATOMS, 3)).astype(
            np.float32)
    conf = Conf(position=jnp.asarray(coords[0]),
                orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                torsions=jnp.zeros((T,), jnp.float32))
    return np.float32(energy), conf, jnp.asarray(coords)


def _cand_container(poses, heavy):
    s = len(poses)
    return mc.PoseContainer(
        energy=jnp.asarray([p[0] for p in poses], jnp.float32),
        position=jnp.stack([p[1].position for p in poses]),
        orientation=jnp.stack([p[1].orientation for p in poses]),
        torsions=jnp.stack([p[1].torsions for p in poses]),
        coords=jnp.stack([jnp.where(heavy[:, None], p[2], 1e9)
                          for p in poses]))


def test_batch_merge_matches_sequential_adds():
    rng = np.random.default_rng(7)
    heavy = jnp.ones((N_ATOMS,), bool)
    k = 5
    cont = mc.empty_container(k, T, N_ATOMS)
    poses = [_pose(rng, energy=e) for e in
             [-3.0, -1.0, -5.0, -2.0, -4.5, -0.5, -6.0, -1.5]]

    seq = cont
    for e, conf, coords in poses:
        seq = mc.add_to_container(seq, conf, jnp.float32(e), coords, heavy,
                                  min_rmsd=1.0)
    batch = mc.batch_merge_candidates(cont, _cand_container(poses, heavy),
                                      heavy, min_rmsd=1.0)

    # widely separated random poses: no dedup triggers, so both methods
    # keep exactly the best-k energies
    seq_e = np.sort(np.asarray(seq.energy))
    bat_e = np.sort(np.asarray(batch.energy))
    np.testing.assert_allclose(bat_e, seq_e, rtol=1e-6)
    assert bat_e[0] == np.float32(-6.0)


def test_batch_merge_dedup_chain_is_greedy():
    """A beats B (similar), B beats C (similar to B, far from A): greedy
    keeps A and C; the one-shot suppress-by-any-better approximation would
    wrongly kill C.  Verifies the fixed-point iteration reaches greedy."""
    rng = np.random.default_rng(3)
    heavy = jnp.ones((N_ATOMS,), bool)
    base = rng.uniform(-10, 10, size=(N_ATOMS, 3)).astype(np.float32)
    # place B 0.8 A from A, C 0.8 A from B (1.6 A from A); min_rmsd = 1.0
    shift = np.zeros((N_ATOMS, 3), np.float32)
    shift[:, 0] = 0.8
    a = (-5.0, *_pose(rng, base, 0.0, -5.0)[1:])
    b = (-4.0, *_pose(rng, base + shift, 0.0, -4.0)[1:])
    c = (-3.0, *_pose(rng, base + 2 * shift, 0.0, -3.0)[1:])
    cont = mc.empty_container(4, T, N_ATOMS)
    out = mc.batch_merge_candidates(cont, _cand_container([a, b, c], heavy),
                                    heavy, min_rmsd=1.0)
    e = np.asarray(out.energy)
    kept = sorted(e[e < MAX_FL])
    assert kept == [-5.0, -3.0]  # A and C survive, B suppressed by A


def test_batch_merge_invalid_candidates_ignored():
    rng = np.random.default_rng(1)
    heavy = jnp.ones((N_ATOMS,), bool)
    cont = mc.empty_container(3, T, N_ATOMS)
    good = _pose(rng, energy=-2.0)
    bad = (np.float32(MAX_FL), good[1], jnp.full((N_ATOMS, 3), 1e9))
    out = mc.batch_merge_candidates(cont, _cand_container([bad, good, bad],
                                                          heavy),
                                    heavy, min_rmsd=1.0)
    e = np.asarray(out.energy)
    assert (e < MAX_FL).sum() == 1
    assert e.min() == np.float32(-2.0)
    # unfilled slots keep the empty conventions for later merges
    assert np.all(np.asarray(out.coords)[e >= MAX_FL] == 1e9)


def test_batch_merge_replaces_worse_similar_slot():
    """A better candidate within min_rmsd of an existing slot replaces it
    (case 1 of add_to_output_container)."""
    rng = np.random.default_rng(5)
    heavy = jnp.ones((N_ATOMS,), bool)
    base_e, base_conf, base_coords = _pose(rng, energy=-2.0)
    cont = mc.empty_container(3, T, N_ATOMS)
    cont = mc.add_to_container(cont, base_conf, jnp.float32(-2.0),
                               base_coords, heavy, min_rmsd=1.0)
    better = (np.float32(-4.0), base_conf, base_coords + 0.01)
    out = mc.batch_merge_candidates(cont, _cand_container([better], heavy),
                                    heavy, min_rmsd=1.0)
    e = np.asarray(out.energy)
    assert (e < MAX_FL).sum() == 1
    assert e.min() == np.float32(-4.0)


def test_batch_merge_vmapped_lanes():
    """Shape check: vmap over a lane axis as the fused MC path uses it."""
    rng = np.random.default_rng(9)
    lanes, k, s = 4, 5, 6
    heavy = jnp.ones((lanes, N_ATOMS), bool)
    conts = jax.vmap(lambda _: mc.empty_container(k, T, N_ATOMS))(
        jnp.arange(lanes))
    cands = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[_cand_container([_pose(rng, energy=-float(i + 1))
                           for i in range(s)], heavy[0])
          for _ in range(lanes)])
    out = jax.vmap(mc.batch_merge_candidates, in_axes=(0, 0, 0, None))(
        conts, cands, heavy, 1.0)
    assert out.energy.shape == (lanes, k)
    assert np.all(np.asarray(out.energy).min(axis=1) == -6.0)


def test_async_stream_vmem_independent_of_budget():
    """The completion-indexed candidate stream's output rows depend only
    on mc_steps and the tree size, NOT the tick budget (the r3 VMEM-guard
    concern is resolved structurally): even a pathological 128-node pack
    at a huge budget stays well under per-core VMEM."""
    for m, mc_steps in ((12, 16), (33, 16), (128, 64)):
        rows = (8 + m + 3) * mc_steps        # srigid + stors + sstat rows
        assert rows * 128 * 4 <= (10 << 20), (m, mc_steps)


def test_async_mc_window_vmem_guard():
    """High-torsion packs scale the async MC WINDOW length down so the
    candidate stream + Hessian scratch fit VMEM; low-torsion ligands keep
    the long default window."""
    from gnina_tpu.docking import _async_mc_steps_guard

    assert _async_mc_steps_guard(128, 12) == 128
    assert _async_mc_steps_guard(128, 64) == 128
    assert _async_mc_steps_guard(128, 100) < 128
    assert _async_mc_steps_guard(128, 300) == 16   # floor
    # where the Hessian scratch alone fits, guarded stream + Hessian
    # stay under the cap (beyond that the guard floors at 16 — the
    # Hessian is a property of the DOF count, not the window)
    for m in (12, 64, 100, 140):
        s = _async_mc_steps_guard(128, m)
        hess = (7 + m) ** 2 * 128 * 4
        if s < 128 and hess < (10 << 20):
            assert (11 + m) * s * 128 * 4 + hess <= (10 << 20), (m, s)
