"""AD4 user-grid bias (--user_grid): a .map file adds an interpolated
energy term per movable atom.

reference: gninasrc/lib/grid.h:63 evaluate_user, grid.cpp:47-49 +
evaluate_aux, main.cpp load_ent_values (:413-426) + setup_user_gd
(:635-670) + cache.cpp:177-179 (user values folded into every search-grid
slot) + non_cache.cpp:168-173 (per-atom addition before curl).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class UserGrid(NamedTuple):
    data: jnp.ndarray           # (nx, ny, nz) float32
    init: jnp.ndarray           # (3,) grid origin (gd.begin)
    factor: jnp.ndarray         # (3,) points-per-Angstrom
    dims_minus_1: jnp.ndarray   # (3,) float


def read_ad4_map(path: str, scaling: float = 1.0
                 ) -> Tuple["UserGrid", np.ndarray, np.ndarray]:
    """Read an AD4 .map -> (UserGrid, box_center, box_size).

    Layout per load_ent_values (main.cpp:413-426): one value per line,
    x fastest.  Box derivation per setup_user_gd (main.cpp:640-670)."""
    with open(path) as f:
        lines = f.read().splitlines()
    spacing = float(lines[3].split()[1])
    nel = [int(v) for v in lines[4].split()[1:4]]
    center = np.array([float(v) for v in lines[5].split()[1:4]], np.float64)

    n = [e + 1 for e in nel]
    vals = np.array([float(v) for v in lines[6:6 + n[0] * n[1] * n[2]]],
                    np.float32) * scaling
    # x fastest -> (z,y,x) order in the stream; store as (x,y,z)
    data = vals.reshape(n[2], n[1], n[0]).transpose(2, 1, 0)

    # setup_user_gd: size = (NELEMENTS+1)*spacing, center += spacing/2,
    # gd.n = ceil(span/granularity), begin = center - n*granularity/2
    size = np.array([(e + 1) * spacing for e in nel], np.float64)
    bcenter = center + 0.5 * spacing
    gd_n = np.ceil(size / spacing)
    begin = bcenter - gd_n * spacing / 2.0
    span = gd_n * spacing

    dims_m1 = np.array([d - 1.0 for d in data.shape], np.float64)
    factor = dims_m1 / span
    ug = UserGrid(data=jnp.asarray(data),
                  init=jnp.asarray(begin.astype(np.float32)),
                  factor=jnp.asarray(factor.astype(np.float32)),
                  dims_minus_1=jnp.asarray(dims_m1.astype(np.float32)))
    return ug, bcenter.astype(np.float32), size.astype(np.float32)


def _curl_scalar(e, v=1000.0):
    """curl() capping (curl.h) applied inside evaluate_aux at c=1000."""
    tmp = v / (v + jnp.maximum(e, 0.0))
    return jnp.where(e > 0, e * tmp, e)


def user_grid_atom_energy(ug: UserGrid, coords, slope):
    """Per-atom evaluate_user values (N,): trilinear with out-of-box slope
    penalty (grid.cpp evaluate_aux), capped at 1000."""
    pos = (coords - ug.init) * ug.factor
    dims = ug.dims_minus_1
    miss = jnp.maximum(-pos, 0.0) + jnp.maximum(pos - dims, 0.0)
    # penalty in grid units x factor_inv = Angstroms
    penalty = slope * jnp.sum(miss / ug.factor, axis=-1)

    sc = jnp.clip(pos, 0.0, dims - 1e-6)
    base_f = jnp.clip(jnp.floor(jax.lax.stop_gradient(sc)), 0.0,
                      jnp.maximum(dims - 1.0, 0.0))
    base = base_f.astype(jnp.int32)
    frac = sc - base_f

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    cube = jax.lax.gather(ug.data, base, dn, (2, 2, 2))  # (N,2,2,2)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    wx = jnp.stack([1 - fx, fx], axis=1)
    wy = jnp.stack([1 - fy, fy], axis=1)
    wz = jnp.stack([1 - fz, fz], axis=1)
    val = jnp.einsum("nxyz,nx,ny,nz->n", cube, wx, wy, wz)
    return _curl_scalar(val) + penalty


def user_values_on_lattice(ug: UserGrid, lo: np.ndarray,
                           granularity: float,
                           npts: Tuple[int, int, int]) -> np.ndarray:
    """User-grid values at every search-cache lattice point (cache.cpp:
    173-179 folds them into each type slot); slope 0 like the reference's
    populate-time evaluation."""
    xs = np.asarray(lo)[0] + granularity * np.arange(npts[0])
    ys = np.asarray(lo)[1] + granularity * np.arange(npts[1])
    zs = np.asarray(lo)[2] + granularity * np.arange(npts[2])
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   axis=-1).reshape(-1, 3).astype(np.float32)
    vals = jax.jit(user_grid_atom_energy, static_argnames=())(
        ug, jnp.asarray(pts), jnp.float32(0.0))
    return np.asarray(vals).reshape(npts)
