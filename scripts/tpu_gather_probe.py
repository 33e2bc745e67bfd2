"""Probe: which trilinear-interpolation formulation is fast on TPU?

Times several mathematically-equivalent lookups of A random (2,2,2) cubes
from a (S,nx,ny,nz) grid.  Prints one JSON line per variant.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

S, NX, NY, NZ = 16, 56, 48, 48
A = int(os.environ.get("PROBE_A", str(64 * 40)))   # lanes*atoms lookups
REPS = int(os.environ.get("PROBE_REPS", "100"))


def timeit(name, fn, *args):
    @jax.jit
    def run(c0, *a):
        def body(i, carry):
            acc, idx = carry
            out = fn(idx, *a)
            acc = acc + out.sum()
            # data-dependent index perturbation so nothing is hoisted
            idx = (idx + (acc * 0).astype(jnp.int32) + 1) % 40
            return acc, idx
        return jax.lax.fori_loop(0, REPS, body, c0)

    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (A, 3), 0, 40, jnp.int32)
    c0 = (jnp.float32(0.0), idx0)
    r = run(c0, *args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = run(c0, *args)
    jax.block_until_ready(r)
    dt = time.time() - t0
    print(json.dumps({"variant": name, "us_per_eval": round(1e6 * dt / REPS, 1)}))


def main():
    key = jax.random.PRNGKey(1)
    grid = jax.random.normal(key, (S, NX, NY, NZ), jnp.float32)
    slot = jax.random.randint(jax.random.PRNGKey(2), (A,), 0, S, jnp.int32)
    frac = jax.random.uniform(jax.random.PRNGKey(3), (A, 3), jnp.float32)
    wx = jnp.stack([1 - frac[:, 0], frac[:, 0]], 1)
    wy = jnp.stack([1 - frac[:, 1], frac[:, 1]], 1)
    wz = jnp.stack([1 - frac[:, 2], frac[:, 2]], 1)

    # V1: current — one gather of (1,2,2,2) cubes from 4D grid
    def v1(idx, grid):
        starts = jnp.concatenate([slot[:, None], idx], axis=1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2, 3))
        cube = jax.lax.gather(grid, starts, dn, (1, 2, 2, 2))
        return jnp.einsum("nxyz,nx,ny,nz->n", cube, wx, wy, wz)

    timeit("v1_cube_gather", v1, grid)

    # V2: flat 1D take of 8 corners
    flat = grid.reshape(-1)

    def v2(idx, flat):
        base = ((slot * NX + idx[:, 0]) * NY + idx[:, 1]) * NZ + idx[:, 2]
        offs = jnp.array([0, 1, NZ, NZ + 1, NY * NZ, NY * NZ + 1,
                          NY * NZ + NZ, NY * NZ + NZ + 1], jnp.int32)
        vals = jnp.take(flat, base[:, None] + offs[None, :])  # (A,8)
        w = jnp.stack([wx[:, 0] * wy[:, 0] * wz[:, 0],
                       wx[:, 0] * wy[:, 0] * wz[:, 1],
                       wx[:, 0] * wy[:, 1] * wz[:, 0],
                       wx[:, 0] * wy[:, 1] * wz[:, 1],
                       wx[:, 1] * wy[:, 0] * wz[:, 0],
                       wx[:, 1] * wy[:, 0] * wz[:, 1],
                       wx[:, 1] * wy[:, 1] * wz[:, 0],
                       wx[:, 1] * wy[:, 1] * wz[:, 1]], axis=1)
        return (vals * w).sum(1)

    timeit("v2_flat_take8", v2, flat)

    # V3: row gather — 4 z-rows per atom from (S*NX*NY, NZ), z via einsum
    rows2d = grid.reshape(S * NX * NY, NZ)

    def v3(idx, rows2d):
        r00 = (slot * NX + idx[:, 0]) * NY + idx[:, 1]
        ridx = jnp.stack([r00, r00 + 1, r00 + NY, r00 + NY + 1], 1)  # (A,4)
        rows = jnp.take(rows2d, ridx.reshape(-1), axis=0)  # (A*4, NZ)
        rows = rows.reshape(A, 4, NZ)
        zsel = jax.vmap(lambda r, i: jax.lax.dynamic_slice(
            r, (0, i), (4, 2)))(rows, idx[:, 2])            # gather again...
        wxy = jnp.stack([wx[:, 0] * wy[:, 0], wx[:, 0] * wy[:, 1],
                         wx[:, 1] * wy[:, 0], wx[:, 1] * wy[:, 1]], 1)
        return jnp.einsum("afz,af,az->a", zsel, wxy, wz)

    timeit("v3_rowgather_dynslice", v3, rows2d)

    # V3b: row gather + one-hot z contraction (no second gather)
    def v3b(idx, rows2d):
        r00 = (slot * NX + idx[:, 0]) * NY + idx[:, 1]
        ridx = jnp.stack([r00, r00 + 1, r00 + NY, r00 + NY + 1], 1)
        rows = jnp.take(rows2d, ridx.reshape(-1), axis=0).reshape(A, 4, NZ)
        zi = jax.lax.broadcasted_iota(jnp.int32, (A, NZ), 1)
        zoh = (jnp.where(zi == idx[:, 2:3], wz[:, 0:1], 0.0)
               + jnp.where(zi == idx[:, 2:3] + 1, wz[:, 1:2], 0.0))
        wxy = jnp.stack([wx[:, 0] * wy[:, 0], wx[:, 0] * wy[:, 1],
                         wx[:, 1] * wy[:, 0], wx[:, 1] * wy[:, 1]], 1)
        return jnp.einsum("afz,af,az->a", rows, wxy, zoh)

    timeit("v3b_rowgather_onehotz", v3b, rows2d)

    # V4: two-stage one-hot matmul (bf16 MXU): (A, S*NX) @ (S*NX, NY*NZ)
    g2 = grid.reshape(S * NX, NY * NZ).astype(jnp.bfloat16)

    def v4(idx, g2):
        xi = jax.lax.broadcasted_iota(jnp.int32, (A, S * NX), 1)
        tgt = slot * NX + idx[:, 0]
        w1 = (jnp.where(xi == tgt[:, None], wx[:, 0:1], 0.0)
              + jnp.where(xi == tgt[:, None] + 1, wx[:, 1:2], 0.0))
        t1 = jnp.dot(w1.astype(jnp.bfloat16), g2,
                     preferred_element_type=jnp.float32)   # (A, NY*NZ)
        t1 = t1.reshape(A, NY, NZ)
        yi = jax.lax.broadcasted_iota(jnp.int32, (A, NY), 1)
        yoh = (jnp.where(yi == idx[:, 1:2], wy[:, 0:1], 0.0)
               + jnp.where(yi == idx[:, 1:2] + 1, wy[:, 1:2], 0.0))
        zi = jax.lax.broadcasted_iota(jnp.int32, (A, NZ), 1)
        zoh = (jnp.where(zi == idx[:, 2:3], wz[:, 0:1], 0.0)
               + jnp.where(zi == idx[:, 2:3] + 1, wz[:, 1:2], 0.0))
        return jnp.einsum("ayz,ay,az->a", t1, yoh, zoh)

    timeit("v4_onehot_mxu", v4, g2)

    # V5: gather rows from z-padded-to-128 layout
    rows128 = jnp.zeros((S * NX * NY, 128), jnp.float32).at[:, :NZ].set(
        grid.reshape(S * NX * NY, NZ))

    def v5(idx, rows128):
        r00 = (slot * NX + idx[:, 0]) * NY + idx[:, 1]
        ridx = jnp.stack([r00, r00 + 1, r00 + NY, r00 + NY + 1], 1)
        rows = jnp.take(rows128, ridx.reshape(-1), axis=0).reshape(A, 4, 128)
        zi = jax.lax.broadcasted_iota(jnp.int32, (A, 128), 1)
        zoh = (jnp.where(zi == idx[:, 2:3], wz[:, 0:1], 0.0)
               + jnp.where(zi == idx[:, 2:3] + 1, wz[:, 1:2], 0.0))
        wxy = jnp.stack([wx[:, 0] * wy[:, 0], wx[:, 0] * wy[:, 1],
                         wx[:, 1] * wy[:, 0], wx[:, 1] * wy[:, 1]], 1)
        return jnp.einsum("afz,af,az->a", rows, wxy, zoh)

    timeit("v5_rowgather128", v5, rows128)

    # V6: interleaved-cell layout — each cell stores its 8 corners
    # contiguously; ONE take of 8 contiguous floats per atom
    cells = jnp.stack([
        grid[:, :-1, :-1, :-1], grid[:, :-1, :-1, 1:],
        grid[:, :-1, 1:, :-1], grid[:, :-1, 1:, 1:],
        grid[:, 1:, :-1, :-1], grid[:, 1:, :-1, 1:],
        grid[:, 1:, 1:, :-1], grid[:, 1:, 1:, 1:]], axis=-1)
    cells = cells.reshape(-1, 8)  # (S*(NX-1)*(NY-1)*(NZ-1), 8)

    def v6(idx, cells):
        cidx = ((slot * (NX - 1) + idx[:, 0]) * (NY - 1) + idx[:, 1]) \
            * (NZ - 1) + idx[:, 2]
        vals = jnp.take(cells, cidx, axis=0)  # (A,8)
        w = jnp.stack([wx[:, 0] * wy[:, 0] * wz[:, 0],
                       wx[:, 0] * wy[:, 0] * wz[:, 1],
                       wx[:, 0] * wy[:, 1] * wz[:, 0],
                       wx[:, 0] * wy[:, 1] * wz[:, 1],
                       wx[:, 1] * wy[:, 0] * wz[:, 0],
                       wx[:, 1] * wy[:, 0] * wz[:, 1],
                       wx[:, 1] * wy[:, 1] * wz[:, 0],
                       wx[:, 1] * wy[:, 1] * wz[:, 1]], axis=1)
        return (vals * w).sum(1)

    timeit("v6_cellrow_take", v6, cells)


if __name__ == "__main__":
    main()
