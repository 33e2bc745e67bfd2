"""Pallas primitive-rate probes for the fused docking kernel design.

Measures, on the real TPU:
  pairs_vpu   — exact vina-style pair-term eval rate (VPU), lanes on the
                128-lane axis, receptor tiled in the sublane axis
  pairs_bf16  — same in bfloat16
  gather_loop — per-(atom,lane) scalar-loop trilinear gather rate from a
                VMEM-resident grid
  mxu_onehot  — one-hot MXU contraction rate for comparison

Each prints ns per pair / per lookup so the fused-kernel step cost can be
projected before committing to a design.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = int(os.environ.get("PROBE_L", "128"))      # lanes (poses)
N = int(os.environ.get("PROBE_N", "32"))       # ligand heavy atoms
K = int(os.environ.get("PROBE_K", "1280"))     # receptor atoms
REPS = int(os.environ.get("PROBE_REPS", "20")) # in-kernel repetitions


def bench(name, fn, *args, work_units=1.0):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    per = dt / REPS
    print(json.dumps({
        "probe": name, "us_per_eval": round(per * 1e6, 1),
        "ns_per_unit": round(per * 1e9 / work_units, 3),
    }))


# ---------------------------------------------------------------- pairs
def make_pairs_kernel(dtype):
    def kernel(ligp_ref, lig_ref, rec_ref, recp_ref, out_ref):
        # lig_ref: (3*N, L) coords (lanes = poses, minor axis), VMEM
        # ligp_ref: (8, N) per-atom params, SMEM (scalar reads)
        # rec_ref: (K, 4) coords+radius; recp_ref: (K, 4) params
        # Loop over ligand atoms; inner work fully vectorized as (K, L).
        recx = rec_ref[:, 0:1].astype(dtype)
        recy = rec_ref[:, 1:2].astype(dtype)
        recz = rec_ref[:, 2:3].astype(dtype)
        recr = rec_ref[:, 3:4].astype(dtype)
        rphi = recp_ref[:, 0:1].astype(dtype)
        rdon = recp_ref[:, 1:2].astype(dtype)
        racc = recp_ref[:, 2:3].astype(dtype)

        def vec1(x):
            # scalar -> (1,1) array so bf16 arith stays vectorized
            # (scalar bf16 mulf fails to legalize in Mosaic)
            return jnp.full((1, 1), x, jnp.float32).astype(dtype)

        def eval_once(carry):
            def atom_body(a, acc):
                ax = lig_ref[pl.ds(a, 1), :].astype(dtype)
                ay = lig_ref[pl.ds(N + a, 1), :].astype(dtype)
                az = lig_ref[pl.ds(2 * N + a, 1), :].astype(dtype)
                dx = recx - ax
                dy = recy - ay
                dz = recz - az
                r2 = dx * dx + dy * dy + dz * dz
                r = jnp.sqrt(r2)
                d = r - (recr + vec1(ligp_ref[0, a]))
                g1 = jnp.exp(-4.0 * d * d)
                dd = (d - 3.0) * 0.5
                g2 = jnp.exp(-dd * dd)
                rep = jnp.where(d < 0, d * d, 0.0)
                hyd = jnp.clip(-d * 1.4285715 - 0.5, 0.0, 1.0) \
                    * (vec1(ligp_ref[1, a]) * rphi)
                hb = jnp.clip(-d * 1.4285715 - 0.42857143, 0.0, 1.0) \
                    * (vec1(ligp_ref[2, a]) * racc
                       + vec1(ligp_ref[3, a]) * rdon)
                e = (-0.0356 * g1 - 0.00516 * g2 + 0.84 * rep
                     - 0.0351 * hyd - 0.587 * hb)
                e = jnp.where(r2 < 64.0, e, 0.0)
                return acc + jnp.sum(e, axis=0, keepdims=True)  # (1, L)

            acc0 = jnp.full((1, L), carry * 1e-30,
                            jnp.float32).astype(dtype)
            acc = jax.lax.fori_loop(0, N, atom_body, acc0)
            return carry + jnp.sum(acc.astype(jnp.float32))

        out = jax.lax.fori_loop(
            0, REPS, lambda i, c: eval_once(c), jnp.float32(0.0))
        out_ref[0, 0] = out

    return kernel


def probe_pairs(dtype, name):
    key = jax.random.PRNGKey(0)
    lig = jax.random.normal(key, (3 * N, L), jnp.float32) * 5.0
    ligp = jnp.abs(jax.random.normal(key, (8, N), jnp.float32))
    rec = jax.random.normal(key, (K, 4), jnp.float32) * 8.0
    recp = jnp.abs(jax.random.normal(key, (K, 4), jnp.float32))

    def run(ligp, lig, rec, recp):
        return pl.pallas_call(
            make_pairs_kernel(dtype),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(ligp, lig, rec, recp)

    bench(name, run, ligp, lig, rec, recp, work_units=N * L * K)


# ---------------------------------------------------- scalar-loop gather
def probe_gather_loop():
    # grid cells (R, 128): row r holds cell r's 8 corners in lanes 0..7
    # (replicated 16x to fill 128 lanes for a fair aligned-load test)
    R = 16 * 56 * 48 * 6  # ~258k rows x 128 lanes x 4B = 132MB -> too big;
    R = 43008             # (S*NX*NY) rows of z-major cells, 22MB -> VMEM no.
    R = 16384             # probe the LOOP RATE, not capacity
    A = N * L             # lookups per eval
    key = jax.random.PRNGKey(0)
    cells = jax.random.normal(key, (R, 128), jnp.float32)
    idx = jax.random.randint(key, (A,), 0, R, jnp.int32)
    w = jax.random.uniform(key, (A, 8), jnp.float32)

    def kernel(idx_ref, cells_ref, w_ref, out_ref):
        def eval_once(carry):
            def body(a, acc):
                row = cells_ref[pl.ds(idx_ref[a], 1), 0:8]
                return acc + jnp.sum(row * w_ref[pl.ds(a, 1), :])

            return carry + jax.lax.fori_loop(0, A, body, jnp.float32(0.0))

        out_ref[0, 0] = jax.lax.fori_loop(
            0, REPS, lambda i, c: eval_once(c), jnp.float32(0.0))

    def run(idx, cells, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(idx, cells, w)

    bench("gather_loop", run, idx, cells, w, work_units=A)


# ----------------------------------------------------------- mxu onehot
def probe_mxu():
    # (A, KDIM) onehot @ (KDIM, 128) grid slab, bf16
    A = N * L
    KDIM = 896
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (KDIM, 128), jnp.bfloat16)
    tgt = jax.random.randint(key, (A, 1), 0, KDIM - 1, jnp.int32)

    def kernel(tgt_ref, g_ref, out_ref):
        def eval_once(carry):
            ii = jax.lax.broadcasted_iota(jnp.int32, (A, KDIM), 1)
            w = jnp.where(ii == tgt_ref[:], 1.0, 0.0).astype(jnp.bfloat16)
            t = jnp.dot(w, g_ref[:], preferred_element_type=jnp.float32)
            return carry + jnp.sum(t)

        out_ref[0, 0] = jax.lax.fori_loop(
            0, REPS, lambda i, c: eval_once(c), jnp.float32(0.0))

    def run(tgt, g):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tgt, g)

    bench("mxu_onehot", run, tgt, g, work_units=A)


def main():
    which = os.environ.get("PROBE_WHICH", "pairs,pairs16,gather,mxu")
    if "pairs" in which:
        probe_pairs(jnp.float32, "pairs_vpu_f32")
    if "pairs16" in which:
        probe_pairs(jnp.bfloat16, "pairs_vpu_bf16")
    if "gather" in which:
        probe_gather_loop()
    if "mxu" in which:
        probe_mxu()


if __name__ == "__main__":
    main()
