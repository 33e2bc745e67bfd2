"""Device-mesh utilities: ligand-batch sharding for virtual screens.

The reference is single-node (SURVEY.md section "Parallelism"): its scale
axes are MC chains (threads) and a ligand work queue.  On TPU the natural
mapping is a 2D mesh:

  axis "dp"  — ligand/pose batches, embarrassingly parallel over ICI
  axis "tp"  — tensor parallelism inside the CNN (wide FC layers / channel
               shards) when models are large enough to warrant it

Docking itself needs NO collectives in the inner loop; only screening
statistics aggregate with psum at the end.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_ligand_batch(mesh: Mesh, batch_pytree):
    """Place a stacked ligand/pose batch with its leading axis over dp."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.device_put(batch_pytree, sharding)


def replicate(mesh: Mesh, pytree):
    return jax.device_put(pytree, NamedSharding(mesh, P()))


def batch_spec() -> P:
    return P("dp")


def replicated_spec() -> P:
    return P()
