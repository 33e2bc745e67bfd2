"""Device-side data structures (JAX pytrees) for docking.

Fixed-shape, padded array bundles: the TPU-native "model".  Where the
reference keeps a mutable `model` object per thread (reference:
gninasrc/lib/model.h), we keep immutable padded arrays and a separate
conformation pytree that batches over poses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gnina_tpu.constants import IS_HYDROGEN


class ReceptorData(NamedTuple):
    """Rigid receptor atoms (padded to a fixed K)."""

    coords: jnp.ndarray    # (K,3)
    types: jnp.ndarray     # (K,) int32
    charges: jnp.ndarray   # (K,)
    mask: jnp.ndarray      # (K,) bool — real atom & not hydrogen


class LigandData(NamedTuple):
    """One ligand's padded arrays; see chem/tree_build.py for semantics."""

    # per atom (N)
    local_coords: jnp.ndarray  # (N,3)
    types: jnp.ndarray         # (N,) int32
    charges: jnp.ndarray       # (N,)
    node_id: jnp.ndarray       # (N,) int32
    atom_mask: jnp.ndarray     # (N,) bool
    heavy_mask: jnp.ndarray    # (N,) bool (real & heavy & movable)
    movable_mask: jnp.ndarray  # (N,) bool (ligand + flex side chains)
    lig_heavy_mask: jnp.ndarray  # (N,) bool (ligand block only, heavy)
    # per node (M)
    parent: jnp.ndarray        # (M,) int32, -1 root
    rel_axis: jnp.ndarray      # (M,3)
    rel_origin: jnp.ndarray    # (M,3)
    layer: jnp.ndarray         # (M,) int32
    node_mask: jnp.ndarray     # (M,) bool
    # intra-ligand pairs (P), capped at v[0]
    pair_a: jnp.ndarray        # (P,) int32
    pair_b: jnp.ndarray        # (P,) int32
    pair_mask: jnp.ndarray     # (P,) bool
    # "other" pairs (Q): flex-involved, capped at v[2]
    opair_a: jnp.ndarray       # (Q,) int32
    opair_b: jnp.ndarray       # (Q,) int32
    opair_mask: jnp.ndarray    # (Q,) bool
    opair_ff: jnp.ndarray      # (Q,) bool — both ends flex (flex-flex pairs
                               # belong to the intramolecular sum,
                               # model.cu:385-397)
    # conf-independent inputs (scalars)
    num_tors: jnp.ndarray
    num_heavy_atoms: jnp.ndarray
    num_hydrophobic_atoms: jnp.ndarray
    ligand_length: jnp.ndarray

    @property
    def num_torsion_slots(self) -> int:
        return self.parent.shape[-1] - 1


class Conf(NamedTuple):
    """Pose DOF (batchable): ligand rigid transform + torsions.

    Mirrors the reference `conf` (conf.h:361) for a single ligand; leading
    batch dimensions broadcast through all ops.
    """

    position: jnp.ndarray     # (...,3)
    orientation: jnp.ndarray  # (...,4) quaternion
    torsions: jnp.ndarray     # (...,T)


def pad_receptor(coords, types, charges, k_pad: int) -> ReceptorData:
    k = len(types)
    if k_pad < k:
        raise ValueError(f"receptor has {k} atoms > pad {k_pad}")
    pad = k_pad - k
    mask = ~IS_HYDROGEN[np.asarray(types)]
    return ReceptorData(
        coords=jnp.asarray(np.pad(np.asarray(coords, np.float32), ((0, pad), (0, 0)))),
        types=jnp.asarray(np.pad(np.asarray(types, np.int32), (0, pad))),
        charges=jnp.asarray(np.pad(np.asarray(charges, np.float32), (0, pad))),
        mask=jnp.asarray(np.pad(mask, (0, pad))),
    )


def pad_ligand(lig, n_pad: int, m_pad: int, p_pad: int,
               q_pad: int = 0) -> LigandData:
    """LigandStruct (chem/tree_build.py) -> padded device LigandData."""
    n, m, p = lig.num_atoms, lig.num_nodes, len(lig.pairs)
    opairs = lig.other_pairs if lig.other_pairs is not None else \
        np.zeros((0, 2), np.int32)
    q = len(opairs)
    q_pad = max(q_pad, ((q + 31) // 32) * 32, 32)
    if n_pad < n or m_pad < m or p_pad < p:
        raise ValueError(f"pad too small: atoms {n}>{n_pad} or nodes {m}>{m_pad} "
                         f"or pairs {p}>{p_pad}")
    an, am, ap = n_pad - n, m_pad - m, p_pad - p
    aq = q_pad - q
    hyd = IS_HYDROGEN[lig.types]
    movable = np.zeros(n, bool)
    movable[: lig.movable_atoms] = True
    lig_heavy = np.zeros(n, bool)
    lig_heavy[: lig.lig_atoms] = ~hyd[: lig.lig_atoms]
    # padded nodes parent to themselves-as-root-children to stay inert
    parent = np.pad(lig.parent, (0, am), constant_values=0)
    layer = np.pad(lig.layer, (0, am), constant_values=1)
    rel_axis = np.pad(lig.rel_axis, ((0, am), (0, 0)))
    rel_axis[m:, 0] = 1.0  # unit axis for padding
    return LigandData(
        local_coords=jnp.asarray(np.pad(lig.local_coords, ((0, an), (0, 0)))),
        types=jnp.asarray(np.pad(lig.types, (0, an))),
        charges=jnp.asarray(np.pad(lig.charges, (0, an))),
        node_id=jnp.asarray(np.pad(lig.node_id, (0, an))),
        atom_mask=jnp.asarray(np.pad(np.ones(n, bool), (0, an))),
        heavy_mask=jnp.asarray(np.pad(~hyd & movable, (0, an))),
        movable_mask=jnp.asarray(np.pad(movable, (0, an))),
        lig_heavy_mask=jnp.asarray(np.pad(lig_heavy, (0, an))),
        parent=jnp.asarray(parent.astype(np.int32)),
        rel_axis=jnp.asarray(rel_axis.astype(np.float32)),
        rel_origin=jnp.asarray(np.pad(lig.rel_origin, ((0, am), (0, 0)))),
        layer=jnp.asarray(layer.astype(np.int32)),
        node_mask=jnp.asarray(np.pad(np.ones(m, bool), (0, am))),
        pair_a=jnp.asarray(np.pad(lig.pairs[:, 0] if p else np.zeros(0, np.int32), (0, ap))),
        pair_b=jnp.asarray(np.pad(lig.pairs[:, 1] if p else np.zeros(0, np.int32), (0, ap))),
        pair_mask=jnp.asarray(np.pad(np.ones(p, bool), (0, ap))),
        opair_a=jnp.asarray(np.pad(opairs[:, 0] if q else np.zeros(0, np.int32), (0, aq))),
        opair_b=jnp.asarray(np.pad(opairs[:, 1] if q else np.zeros(0, np.int32), (0, aq))),
        opair_mask=jnp.asarray(np.pad(np.ones(q, bool), (0, aq))),
        opair_ff=jnp.asarray(np.pad(
            (opairs[:, 0] >= lig.lig_atoms) & (opairs[:, 1] >= lig.lig_atoms)
            if q else np.zeros(0, bool), (0, aq))),
        num_tors=jnp.float32(lig.num_tors),
        num_heavy_atoms=jnp.float32(lig.num_heavy_atoms),
        num_hydrophobic_atoms=jnp.float32(lig.num_hydrophobic_atoms),
        ligand_length=jnp.float32(lig.ligand_length),
    )


def initial_conf(lig, t_pad: int) -> Conf:
    """Null conf: identity orientation, zero torsions, position = root origin
    (model.cpp:741 get_initial_conf)."""
    return Conf(
        position=jnp.asarray(lig.orig_coords[0]),
        orientation=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        torsions=jnp.zeros((t_pad,), jnp.float32),
    )
