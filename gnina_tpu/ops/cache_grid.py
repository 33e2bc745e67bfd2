"""Per-type energy grids + trilinear evaluation: the `cache` search path.

reference: gninasrc/lib/cache.cpp populate/eval, grid.cpp evaluate_aux.
The reference precomputes, per ligand atom type, a 0.375-A grid of summed
receptor interactions over the search box, then evaluates movable atoms by
trilinear interpolation during the Monte Carlo search (exact pairwise sums
are only used for refinement/final scoring).  This is the classic
Vina/smina speed trick and it maps well to TPU:

- populate: grid-point x receptor-atom distance matrices via MXU matmuls
  (like the voxelizer), term math on the VPU, one pass per x-slab;
  amortized over every chain/step/ligand sharing the receptor + box.
- evaluate: 8 corner gathers + trilinear weights per atom — tiny compared
  to the N x K pairwise sum it replaces in the innermost BFGS loop.

Out-of-box behavior matches grid.cpp:100-131: clamped interpolation at the
edge cell plus slope * distance penalty; gradients vanish in the clamped
axes (autodiff through the clamp reproduces `gradient_everywhere`).
Charge-dependent scoring functions add a second grid multiplied by the
(signed) ligand charge, exactly like grid::evaluate (grid.cpp:28-45).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.ops.energy import gather_params, _type_param_arrays
from gnina_tpu.scoring.weighted import ScoringFunction, curl

GRANULARITY = 0.375  # main.cpp:622


class CacheGrids(NamedTuple):
    data: jnp.ndarray          # (S, nx, ny, nz)
    chargedata: jnp.ndarray    # (S, nx, ny, nz) or (S,1,1,1) zeros
    slot_of_type: jnp.ndarray  # (28,) int32: smina type -> slot (or 0)
    type_gridded: jnp.ndarray  # (28,) bool: type has a valid slot
    origin: jnp.ndarray        # (3,)
    dims_minus_1: jnp.ndarray  # (3,) float: n points - 1 per axis (actual)
    # interpolation-friendly layout: cells[c, :] = the 8 corner values of
    # cell c, stored CONTIGUOUSLY.  One aligned 8-float `take` row per atom
    # replaces the strided (2,2,2) cube gather — measured 13x faster on
    # TPU (the XLA gather engine pays per non-contiguous segment).
    # Shape (S*nx*ny*nz, 8); trades 8x grid HBM for gather speed.
    cells: jnp.ndarray = None
    ccells: jnp.ndarray = None  # same layout for chargedata (or (1,8))


def _make_cells(data: jnp.ndarray) -> jnp.ndarray:
    """(S,nx,ny,nz) -> (S*nx*ny*nz, 8) corner-interleaved cell rows.

    Row for cell (s,x,y,z) holds data[s, x+i, y+j, z+k] for (i,j,k) in
    binary order.  Edge cells (x=nx-1 etc.) hold wrapped garbage but are
    never addressed: interpolation bases are clamped to dims-2 points.
    """
    s, nx, ny, nz = data.shape
    corners = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                corners.append(jnp.roll(data, (-i, -j, -k), axis=(1, 2, 3)))
    return jnp.stack(corners, axis=-1).reshape(-1, 8)


def grid_shape_for(lo: np.ndarray, hi: np.ndarray) -> Tuple[int, int, int]:
    """Static padded point counts per axis for a search box."""
    n = np.ceil((np.asarray(hi) - np.asarray(lo)) / GRANULARITY).astype(int) + 1
    return tuple(int(((v + 7) // 8) * 8) for v in n)


def make_populate_fn(sf: ScoringFunction, npts: Tuple[int, int, int],
                     num_slots: int, charge_terms: bool):
    """Build a jittable populate(rec, lo, hi, slot_types) -> CacheGrids."""
    tables = _type_param_arrays(sf)
    cutoff_sqr = sf.cutoff ** 2
    nx, ny, nz = npts

    def populate(rec, lo, hi, slot_types, slot_of_type, type_gridded):
        pr = gather_params(tables, rec.types)
        pslot = gather_params(tables, slot_types)        # (S,) params
        pa = {k: (v[:, None, None] if v.ndim == 1 else v)
              for k, v in pslot.items()}
        pb = {k: (v[None, None, :] if v.ndim == 1 else v)
              for k, v in pr.items()}

        xs = lo[0] + GRANULARITY * jnp.arange(nx, dtype=jnp.float32)
        ys = lo[1] + GRANULARITY * jnp.arange(ny, dtype=jnp.float32)
        zs = lo[2] + GRANULARITY * jnp.arange(nz, dtype=jnp.float32)
        yz = jnp.stack(jnp.meshgrid(ys, zs, indexing="ij"), -1).reshape(-1, 2)

        def slab(x):
            pts = jnp.concatenate([jnp.full((yz.shape[0], 1), x), yz], axis=1)
            r2 = (jnp.sum(pts * pts, axis=1)[:, None]
                  + jnp.sum(rec.coords * rec.coords, axis=1)[None, :]
                  - 2.0 * jnp.matmul(pts, rec.coords.T,
                                     precision=jax.lax.Precision.HIGHEST))
            r = jnp.sqrt(jnp.maximum(r2, 1e-12))                 # (P,K)
            valid = (r2 < cutoff_sqr) & rec.mask[None, :]
            # charge-independent accumulation; receptor |q| terms fold into
            # the type grid (cache.cpp:152-160).  The ligand charge q_a is
            # set to 0 for the type grid and the charge grid is the
            # derivative wrt q_a evaluated around 0 when charge terms exist.
            e = sf.eval_pair(pa, {**pb}, r[None, :, :] * jnp.ones((num_slots, 1, 1)),
                             qa=jnp.zeros((num_slots, 1, 1)),
                             qb=rec.charges[None, None, :])
            e = jnp.where(valid[None, :, :], e, 0.0).sum(axis=2)  # (S,P)
            if charge_terms:
                eps = 1.0
                e_q = sf.eval_pair(pa, {**pb},
                                   r[None, :, :] * jnp.ones((num_slots, 1, 1)),
                                   qa=jnp.full((num_slots, 1, 1), eps),
                                   qb=rec.charges[None, None, :])
                e_q = jnp.where(valid[None, :, :], e_q, 0.0).sum(axis=2)
                cgrid = (e_q - e) / eps
            else:
                cgrid = jnp.zeros_like(e)
            return e.reshape(num_slots, ny, nz), cgrid.reshape(num_slots, ny, nz)

        data, cdata = jax.lax.map(slab, xs)          # (nx, S, ny, nz)
        data = jnp.transpose(data, (1, 0, 2, 3))
        cdata = jnp.transpose(cdata, (1, 0, 2, 3))
        if not charge_terms:
            cdata = jnp.zeros((num_slots, 1, 1, 1), jnp.float32)
        dims_m1 = jnp.ceil((hi - lo) / GRANULARITY)
        cells = _make_cells(data)
        ccells = (_make_cells(cdata) if charge_terms
                  else jnp.zeros((1, 8), jnp.float32))
        return CacheGrids(data=data, chargedata=cdata,
                          slot_of_type=slot_of_type,
                          type_gridded=type_gridded,
                          origin=lo, dims_minus_1=dims_m1,
                          cells=cells, ccells=ccells)

    return populate


def _trilinear(cells, grid_shape, slot, base_idx, frac):
    """Trilinear interpolation: ONE contiguous 8-float row per atom.

    cells: (S*nx*ny*nz, 8) corner-interleaved layout (_make_cells);
    slot: (N,); base_idx: (N,3); frac: (N,3).
    A contiguous aligned row `take` is ~13x faster than the strided
    (2,2,2) cube gather on TPU (one memory segment per row instead of 4)."""
    _, nx, ny, nz = grid_shape
    cidx = ((slot * nx + base_idx[:, 0]) * ny + base_idx[:, 1]) * nz \
        + base_idx[:, 2]
    rows = jnp.take(cells, cidx, axis=0)  # (N,8)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    wx = jnp.stack([1 - fx, fx], axis=1)
    wy = jnp.stack([1 - fy, fy], axis=1)
    wz = jnp.stack([1 - fz, fz], axis=1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)
    return jnp.sum(rows * w, axis=1)


def cache_inter_energy(grids: CacheGrids, coords, types, charges, heavy_mask,
                       slope, v1):
    """Trilinear grid energy per movable heavy atom (cache::eval_deriv).

    Differentiable in coords; the clamp makes in-cell gradients exact and
    zeroes them outside (grid.cpp:176-181), while the slope penalty keeps
    its +-slope gradient.
    """
    s, nx, ny, nz = grids.data.shape
    factor = 1.0 / GRANULARITY
    pos = (coords - grids.origin) * factor          # (N,3) grid units
    dims = grids.dims_minus_1                        # (3,)

    miss = jnp.maximum(-pos, 0.0) + jnp.maximum(pos - dims, 0.0)
    penalty = slope * jnp.sum(miss, axis=1) * GRANULARITY

    # clip gradient: 1 inside the box, 0 when clamped -> the interpolation
    # gradient vanishes in out-of-box axes exactly like gradient_everywhere
    sc = jnp.clip(pos, 0.0, dims - 1e-6)
    base_f = jnp.clip(jnp.floor(jax.lax.stop_gradient(sc)), 0.0,
                      jnp.maximum(dims - 1.0, 0.0))
    base = base_f.astype(jnp.int32)
    frac = sc - base_f  # differentiable via sc

    slot = grids.slot_of_type[types]                 # (N,)
    f = _trilinear(grids.cells, grids.data.shape, slot, base, frac)
    if grids.chargedata.shape[1] > 1:
        fc = _trilinear(grids.ccells, grids.data.shape, slot, base, frac)
        f = f + charges * fc
    f = curl(f, v1)
    valid = heavy_mask & grids.type_gridded[types]
    return jnp.sum(jnp.where(valid, f + penalty, 0.0))
