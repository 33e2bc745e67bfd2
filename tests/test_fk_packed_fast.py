"""Fast-tier parity for fk_packed, the XLA twin of the fused kernel's FK.

fk_packed rebuilds coordinates for the conf-only async-MC candidate
stream (ops/mc_fused.py), so its parity with ops/fk.fk_coords is
load-bearing for container RMSD dedup.  Pure XLA — no kernel compile —
so it runs in the fast tier.  Regression guard for the TPU bf16-einsum
precision bug (fk_packed must accumulate in f32 like the kernel fk).

reference semantics: tree.h:322-326 set_conf.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnina_tpu.chem import ingest, sdf
from gnina_tpu.chem.tree_build import build_tree_from_molecule
from gnina_tpu.docking import DockingEngine, DockSettings
from gnina_tpu.ops import fk, mc
from gnina_tpu.ops import pallas_dock as pd
from gnina_tpu.types import Conf

DATA = "/root/reference/test/gnina/data"


@pytest.fixture(scope="module")
def system():
    rec = ingest.Receptor.from_file(f"{DATA}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{DATA}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{DATA}/noelem.sdf")
    size = np.minimum(np.asarray(size, np.float32), 12.0)
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])
    eng = DockingEngine(DockSettings(cnn_scoring="none"))
    lig_d, rec_d, box, max_layers, _n = eng._prepare(rec, lig, center, size)
    pack = pd.build_pack([lig], np.asarray(rec_d.coords),
                         np.asarray(rec_d.types), np.asarray(rec_d.charges),
                         np.asarray(rec_d.mask), exhaustiveness=8,
                         table=eng.sf.table)
    return lig_d, box, max_layers, pack


def _check(confs, lanes, lig_d, max_layers, pack, atol=1e-4):
    m = pack.nodeoh.shape[0]
    rigid, tors = pd.conf_to_packed(confs, m)
    l_pad = pack.lc.shape[-1]
    rigid = jnp.pad(rigid, ((0, 0), (0, l_pad - lanes)))
    tors = jnp.pad(tors, ((0, 0), (0, l_pad - lanes)))
    coords = pd.fk_packed(rigid, tors, pack)             # (3, N, l_pad)

    ref = jax.vmap(lambda c: fk.fk_coords(lig_d, c, max_layers))(confs)
    hidx = pack.heavy_idx[0]
    nh = int((hidx >= 0).sum())
    ref_h = np.asarray(ref)[:, hidx[:nh], :]             # (L, nh, 3)
    got = np.transpose(np.asarray(coords[..., :lanes]), (2, 1, 0))[:, :nh, :]
    np.testing.assert_allclose(got, ref_h, atol=atol)


def test_fk_packed_identity_conf(system):
    """Zero torsions + identity orientation must reproduce FK exactly —
    any deviation here is a systematic math/precision bug, not noise."""
    lig_d, box, max_layers, pack = system
    t = lig_d.num_torsion_slots
    conf = Conf(position=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
                orientation=jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
                torsions=jnp.zeros((1, t), jnp.float32))
    _check(conf, 1, lig_d, max_layers, pack)


def test_fk_packed_random_confs(system):
    lig_d, box, max_layers, pack = system
    t = lig_d.num_torsion_slots
    keys = jax.random.split(jax.random.PRNGKey(11), 8)
    confs = jax.vmap(lambda k: mc.randomize_conf(
        k, lig_d, box.lo, box.hi, t))(keys)
    _check(confs, 8, lig_d, max_layers, pack)
