"""CNN training step over converted specs, sharded over a device mesh.

The gnina ecosystem trains its scoring CNNs offline (gnina-torch); this
module provides the equivalent TPU-native training step: pose
classification (cross-entropy on the log-softmax head) + affinity
regression (pseudo-Huber as in the gnina papers), differentiated through
the same runtime that serves inference.

Sharding: batch over "dp", the wide fully-connected heads over "tp"
(their 27648-dim contraction is the only tensor big enough to matter);
conv tower parameters replicated, gradients all-reduced by GSPMD.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnina_tpu.models import runtime


def loss_fn(spec: dict, params, grids, labels, affinities):
    out = runtime.execute(spec, params, grids)
    logp = out[0]                      # (B,2) log-probabilities
    aff = out[1]                       # (B,)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    # pseudo-Huber on affinity; hinge for poor poses (label 0): only
    # penalize over-prediction
    diff = aff - affinities
    diff = jnp.where(labels == 1, diff, jnp.maximum(diff, 0.0))
    huber = jnp.mean(jnp.sqrt(1.0 + diff * diff) - 1.0)
    return ce + huber


def param_shardings(mesh: Mesh, params: Dict[str, jnp.ndarray]):
    """Shard 2D FC weights over tp (columns); replicate the rest."""
    out = {}
    for k, v in params.items():
        if v.ndim == 2 and v.shape[-1] % mesh.shape["tp"] == 0 \
                and v.shape[-1] >= 1024:
            out[k] = NamedSharding(mesh, P(None, "tp"))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def make_train_step(spec: dict, optimizer):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, grids, labels, affinities):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(spec, p, grids, labels, affinities))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train_setup(mesh: Mesh, spec: dict, params, learning_rate: float = 1e-3):
    """Place params on the mesh and build (train_step, opt_state)."""
    shardings = param_shardings(mesh, params)
    params = {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
    optimizer = optax.sgd(learning_rate, momentum=0.9)
    opt_state = optimizer.init(params)
    return params, opt_state, make_train_step(spec, optimizer)
