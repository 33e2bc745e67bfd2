"""JAX executor for converted CNN specs (see torchscript_import.py).

Replays the op list of a converted gnina CNN on (B, C, D, H, W) inputs using
XLA-native primitives: conv_general_dilated on the MXU, reduce_window pools,
folded inference batch-norm.  This is the TPU replacement for libtorch
TorchScript execution (reference: gninasrc/lib/torch_model.cpp:153-199).
"""

from __future__ import annotations

import json
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_CONV_DN = ("NCDHW", "OIDHW", "NCDHW")


def _resolve(arg, env, params):
    tag = arg[0]
    if tag == "ref":
        return env[arg[1]]
    if tag == "param":
        return params[arg[1]]
    if tag == "const":
        return arg[1]
    if tag == "list":
        return [_resolve(a, env, params) for a in arg[1]]
    if tag == "tuple":
        return [env[n] for n in arg[1]]
    raise ValueError(f"bad arg {arg}")


def _pool_dims(kernel, stride, pad, ndim=5):
    if not stride:  # torch semantics: empty stride list means stride=kernel
        stride = kernel
    lead = ndim - len(kernel)
    window = (1,) * lead + tuple(kernel)
    strides = (1,) * lead + tuple(stride)
    padding = ((0, 0),) * lead + tuple((p, p) for p in pad)
    return window, strides, padding


def execute(spec: dict, params: Dict[str, jnp.ndarray], x: jnp.ndarray,
            precision=None):
    """Run the converted model. x: (B, C, D, H, W). Returns list of outputs
    [pose_log_softmax (B,2), affinity (B,)] for the standard models.

    precision: jax.lax.Precision for MXU ops.  Defaults to HIGHEST — the
    CNN scores must match the reference to ~3 decimals (test_cnn.py:43),
    which bf16 MXU passes do not provide.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    env = {spec["input"]: x}
    batch = x.shape[0]

    for op in spec["ops"]:
        kind = op["op"]
        args = op["in"]

        def A(i):
            return _resolve(args[i], env, params)

        if kind == "aten::max_pool3d":
            window, strides, padding = _pool_dims(A(1), A(2), A(3), A(0).ndim)
            out = jax.lax.reduce_window(A(0), -jnp.inf, jax.lax.max,
                                        window, strides, padding)
        elif kind == "aten::avg_pool3d":
            window, strides, padding = _pool_dims(A(1), A(2), A(3), A(0).ndim)
            s = jax.lax.reduce_window(A(0), 0.0, jax.lax.add,
                                      window, strides, padding)
            out = s / float(np.prod(A(1)))
        elif kind == "aten::_convolution":
            xin, w, b = A(0), A(1), A(2)
            stride, padding, dilation = A(3), A(4), A(5)
            out = jax.lax.conv_general_dilated(
                xin, w, window_strides=tuple(stride),
                padding=tuple((p, p) for p in padding),
                rhs_dilation=tuple(dilation),
                dimension_numbers=_CONV_DN,
                preferred_element_type=jnp.float32,
                precision=precision)
            if b is not None:
                out = out + b.reshape(1, -1, 1, 1, 1)
        elif kind == "aten::batch_norm":
            xin, w, b, mean, var = A(0), A(1), A(2), A(3), A(4)
            eps = A(7)
            scale = w / jnp.sqrt(var + eps)
            shift = b - mean * scale
            out = xin * scale.reshape(1, -1, 1, 1, 1) + \
                shift.reshape(1, -1, 1, 1, 1)
        elif kind in ("aten::relu", "aten::relu_"):
            out = jnp.maximum(A(0), 0.0)
        elif kind == "aten::sigmoid":
            out = jax.nn.sigmoid(A(0))
        elif kind == "aten::cat":
            out = jnp.concatenate(A(0), axis=A(1))
        elif kind in ("aten::view", "aten::reshape"):
            shape = A(1)
            shape = [batch if (i == 0 and s == -1) else s
                     for i, s in enumerate(shape)]
            out = jnp.reshape(A(0), shape)
        elif kind == "aten::flatten":
            x = A(0)
            start = A(1) if len(args) > 1 and args[1][0] == "const" and args[1][1] is not None else 1
            out = jnp.reshape(x, x.shape[:start] + (-1,))
        elif kind == "aten::linear":
            w, b = A(1), A(2)
            out = jnp.matmul(A(0), w.T, precision=precision)
            if b is not None:
                out = out + b
        elif kind == "aten::t":
            out = A(0).T
        elif kind == "aten::addmm":
            out = A(0) + jnp.matmul(A(1), A(2), precision=precision)
        elif kind == "aten::matmul":
            out = jnp.matmul(A(0), A(1), precision=precision)
        elif kind == "aten::size":
            out = A(0).shape[A(1)]
        elif kind in ("prim::NumToTensor", "aten::Int", "aten::ScalarImplicit"):
            out = A(0)
        elif kind in ("aten::add", "aten::add_"):
            out = A(0) + A(1)
        elif kind == "aten::log_softmax":
            out = jax.nn.log_softmax(A(0), axis=A(1))
        elif kind == "aten::softmax":
            out = jax.nn.softmax(A(0), axis=A(1))
        elif kind == "aten::squeeze":
            out = jnp.squeeze(A(0), axis=A(1))
        elif kind in ("aten::dropout", "aten::feature_dropout"):
            out = A(0)  # inference mode
        elif kind == "aten::slice":
            x, dim, start, end = A(0), A(1), A(2), A(3)
            step = A(4) if len(args) > 4 else 1
            size = x.shape[dim]
            start = 0 if start is None else (start + size if start < 0 else start)
            end = size if end is None or end > size else (end + size if end < 0 else end)
            idx = [slice(None)] * x.ndim
            idx[dim] = slice(start, end, step)
            out = x[tuple(idx)]
        elif kind == "aten::select":
            x, dim, i = A(0), A(1), A(2)
            out = jnp.take(x, i, axis=dim)
        elif kind == "aten::mul":
            out = A(0) * A(1)
        elif kind == "aten::sub":
            out = A(0) - A(1)
        elif kind == "aten::div":
            out = A(0) / A(1)
        elif kind == "aten::exp":
            out = jnp.exp(A(0))
        elif kind == "aten::where":
            out = jnp.where(A(0), A(1), A(2))
        elif kind == "aten::gt":
            out = A(0) > A(1)
        elif kind == "aten::lt":
            out = A(0) < A(1)
        elif kind == "aten::zeros_like":
            out = jnp.zeros_like(A(0))
        elif kind == "aten::zeros":
            out = jnp.zeros(tuple(A(0)), jnp.float32)
        elif kind == "aten::ones":
            out = jnp.ones(tuple(A(0)), jnp.float32)
        elif kind == "aten::hstack":
            out = jnp.hstack(A(0))
        elif kind == "aten::unsqueeze":
            out = jnp.expand_dims(A(0), A(1))
        else:
            raise NotImplementedError(kind)
        env[op["out"]] = out

    outs = []
    for o in spec["output"]:
        if isinstance(o, str):  # legacy spec format: plain env names
            outs.append(env[o])
        else:
            outs.append(_resolve(o, env, params))
    return outs


def load_spec(spec_path: str, npz_path: str):
    with open(spec_path) as f:
        spec = json.load(f)

    def tupled(x):
        if isinstance(x, list) and x and x[0] in ("ref", "param", "const",
                                                  "list", "tuple"):
            if x[0] == "list":
                return (x[0], [tupled(v) for v in x[1]])
            return tuple(x)
        return x

    for op in spec["ops"]:
        op["in"] = [tupled(a) for a in op["in"]]
    spec["output"] = [o if isinstance(o, str) else tupled(o)
                      for o in spec["output"]]
    raw = np.load(npz_path)
    params = {k: jnp.asarray(raw[k]) for k in raw.files}
    return spec, params
