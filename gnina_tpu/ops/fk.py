"""Forward kinematics over the BFS-layered ligand tree, as a fixed-trip scan.

TPU-native replacement for the recursive heterotree FK (reference:
gninasrc/lib/tree.h:322-326 set_conf, and the BFS-flattened GPU version
tree_gpu.cu).  All nodes are updated vectorially layer by layer; masking
keeps padded nodes inert.  Differentiating through this function w.r.t. a
zero rotation-vector increment reproduces the reference's force->torque
reverse pass (tree.h:374-393) exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnina_tpu.ops import quat as Q
from gnina_tpu.types import Conf, LigandData


def fk_node_frames(lig: LigandData, conf: Conf, max_layers: int):
    """Compute per-node (origin, quaternion) for a single conf.

    Returns origins (M,3), quats (M,4).

    Frames are packed into one (M,7) array so each layer does a single
    gather + a single masked update — per-op fixed cost dominates this
    computation on TPU, so op count matters more than FLOPs here.
    """
    m = lig.parent.shape[0]
    frames = jnp.concatenate([
        jnp.zeros((m, 3), jnp.float32).at[0].set(conf.position),
        jnp.tile(Q.QT_IDENTITY, (m, 1)).at[0].set(conf.orientation),
    ], axis=1)

    # torsion for node i (i>=1) is torsions[i-1]
    torsions = jnp.concatenate([jnp.zeros((1,), jnp.float32), conf.torsions])
    half = 0.5 * Q.normalize_angle(torsions)
    cos_h = jnp.cos(half)[:, None]
    sin_h = jnp.sin(half)[:, None]

    # parent == -1 means the virtual identity frame (flex-residue
    # first_segments, tree.h:266-291): origin 0, identity orientation
    parentc = jnp.maximum(lig.parent, 0)
    identity_frame = jnp.concatenate(
        [jnp.zeros((m, 3)), jnp.broadcast_to(Q.QT_IDENTITY, (m, 4))], axis=1)
    is_root_child = (lig.parent < 0)[:, None]

    for l in range(1, max_layers + 1):
        p = jnp.where(is_root_child, identity_frame, frames[parentc])
        p_origin, p_quat = p[:, :3], p[:, 3:]
        new_origin = p_origin + Q.qrotate(p_quat, lig.rel_origin)
        axis = Q.qrotate(p_quat, lig.rel_axis)
        # angle_to_quaternion(axis, torsion) with axis unit-length
        tq = jnp.concatenate([cos_h, sin_h * axis], axis=1)
        new_quat = Q.qnormalize_approx(Q.qmul(tq, p_quat))
        upd = (lig.layer == l)[:, None]
        frames = jnp.where(upd, jnp.concatenate([new_origin, new_quat], axis=1),
                           frames)
    return frames[:, :3], frames[:, 3:]


def fk_coords(lig: LigandData, conf: Conf, max_layers: int):
    """Atom lab coordinates (N,3) for a single conf.

    Static (inflex) atoms bypass FK: their local_coords hold absolute
    positions."""
    origins, quats = fk_node_frames(lig, conf, max_layers)
    node = lig.node_id
    moved = origins[node] + Q.qrotate(quats[node], lig.local_coords)
    return jnp.where(lig.movable_mask[:, None], moved, lig.local_coords)


def conf_increment(conf: Conf, delta: jnp.ndarray, factor) -> Conf:
    """conf.increment(change, factor) (conf.h:113-118,385-394).

    delta is a flat (6+T,) change vector: [dpos(3), rotvec(3), dtors(T)].
    Torsion increments are angle-normalized before and after adding.
    """
    pos = conf.position + factor * delta[:3]
    quat = Q.quaternion_increment(conf.orientation, factor * delta[3:6])
    tors = Q.normalize_angle(conf.torsions + Q.normalize_angle(factor * delta[6:]))
    return Conf(position=pos, orientation=quat, torsions=tors)


def conf_with_increment_var(conf: Conf, eps: jnp.ndarray) -> Conf:
    """Apply a differentiable zero increment for gradient extraction.

    eps is a (6+T,) vector; at eps=0 this is the identity, and
    d(energy)/d(eps) equals the reference's `change` gradient layout:
    [force(3), torque(3), dtorsions(T)].
    """
    pos = conf.position + eps[:3]
    quat = Q.qmul(Q.rotvec_to_quaternion(eps[3:6]), conf.orientation)
    tors = conf.torsions + eps[6:]
    return Conf(position=pos, orientation=quat, torsions=tors)
