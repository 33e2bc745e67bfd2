"""CNN gradient debug outputs: --cnn_outputxyz / --cnn_outputdx /
--cnn_gradient_check.

Reference surface: main.cpp:1007,1030-1033 (flags; in the reference's
torch-only build outputxyz forces gradient computation,
cnn_torch_scorer.cpp:164, and the caffe-era writers are gone — we
implement the documented intent: dump the per-atom CNN gradient as .xyz,
the loss gradient w.r.t. the voxel grid as per-channel .dx, and run a
finite-difference check of the analytic atom gradient).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.constants import smina_type_to_element_name
from gnina_tpu.models import runtime
from gnina_tpu.ops.voxelize import voxelize


def _elements(types) -> List[str]:
    return [smina_type_to_element_name(int(t)) for t in np.asarray(types)]


def write_gradient_xyz(path: str, types, coords, grads) -> None:
    """XYZ with the gradient in the comment-free extra columns
    (`El x y z gx gy gz` rows, like the caffe-era ouput_xyz)."""
    coords = np.asarray(coords)
    grads = np.asarray(grads)
    els = _elements(types)
    with open(path, "w") as f:
        f.write(f"{len(els)}\n")
        f.write("CNN gradient (kcal/mol/A per coordinate)\n")
        for el, c, g in zip(els, coords, grads):
            f.write(f"{el:2s} {c[0]:12.5f} {c[1]:12.5f} {c[2]:12.5f} "
                    f"{g[0]:12.6f} {g[1]:12.6f} {g[2]:12.6f}\n")


def atom_gradients(scorer, rec_coords, rec_types, rec_mask,
                   lig, coords, center):
    """(lig_grad (N,3), rec_grad (K,3)): d(ensemble loss)/d coords."""
    generic = scorer.make_loss_fn_generic(rec_coords, rec_types, rec_mask)
    lig_mask = jnp.ones(len(coords), bool)
    lig_types = jnp.asarray(lig.types)
    center = jnp.asarray(center, jnp.float32)

    def wrt_lig(xyz):
        return generic(xyz, lig_types, lig_mask, center)

    lig_grad = jax.grad(wrt_lig)(jnp.asarray(coords, jnp.float32))

    # receptor gradient: rebind the generic loss with receptor coords as
    # the differentiable argument
    def wrt_rec(rxyz):
        g = scorer.make_loss_fn_generic(rxyz, rec_types, rec_mask)
        return g(jnp.asarray(coords, jnp.float32), lig_types, lig_mask,
                 center)

    rec_grad = jax.grad(wrt_rec)(jnp.asarray(rec_coords, jnp.float32))
    return np.asarray(lig_grad), np.asarray(rec_grad)


def write_grid_gradient_dx(prefix: str, scorer, rec_coords, rec_types,
                           rec_mask, lig, coords, center, log=None) -> list:
    """Per-channel .dx files of d(loss)/d(voxel) for the FIRST model in
    the ensemble (--cnn_outputdx)."""
    from gnina_tpu.tools.gninagrid import write_dx

    m = scorer.models[0]
    rec_coords = jnp.asarray(rec_coords, jnp.float32)
    lig_coords = jnp.asarray(coords, jnp.float32)
    nrec = m.rec_typer.num_channels
    rec_chan = jnp.asarray(m.rec_typer.table)[jnp.asarray(rec_types)]
    lig_chan_raw = jnp.asarray(m.lig_typer.table)[jnp.asarray(lig.types)]
    lig_chan = jnp.where(lig_chan_raw >= 0, lig_chan_raw + nrec, -1)
    channels = jnp.concatenate([rec_chan, lig_chan])
    radii = jnp.concatenate([
        jnp.asarray(m.rec_typer.radii)[jnp.asarray(rec_types)],
        jnp.asarray(m.lig_typer.radii)[jnp.asarray(lig.types)]])
    mask = jnp.concatenate([jnp.asarray(rec_mask),
                            jnp.ones(len(coords), bool)])
    allc = jnp.concatenate([rec_coords, lig_coords])
    grid = voxelize(allc, channels, radii, mask,
                    jnp.asarray(center, jnp.float32),
                    num_channels=m.num_channels, npoints=m.grid_points,
                    resolution=m.resolution, radius_scale=m.radius_scale)

    def loss_of_grid(g):
        outputs = runtime.execute(m.spec, m.params, g[None])
        from gnina_tpu.models.scorer import _pose_from_outputs
        _p, _a, loss = _pose_from_outputs(m, outputs)
        return loss[0]

    ggrad = np.asarray(jax.grad(loss_of_grid)(grid))
    names = (list(m.rec_typer.channel_names)
             + [f"lig_{c}" for c in m.lig_typer.channel_names])
    written = []
    for ci in range(ggrad.shape[0]):
        path = f"{prefix}_grad_{names[ci]}.dx"
        write_dx(path, ggrad[ci], np.asarray(center), m.resolution)
        written.append(path)
    if log is not None:
        log.write(f"Wrote {len(written)} grid-gradient .dx files "
                  f"({prefix}_grad_*.dx)\n")
    return written


def gradient_check(scorer, rec_coords, rec_types, rec_mask, lig, coords,
                   center, log, n_atoms: int = 3, eps: float = 1e-2) -> float:
    """Central finite-difference check of the analytic ligand-coordinate
    gradient (--cnn_gradient_check).  Prints and returns the max relative
    error over the first n_atoms atoms x 3 axes."""
    generic = scorer.make_loss_fn_generic(rec_coords, rec_types, rec_mask)
    lig_mask = jnp.ones(len(coords), bool)
    lig_types = jnp.asarray(lig.types)
    center = jnp.asarray(center, jnp.float32)

    def f(xyz):
        return generic(xyz, lig_types, lig_mask, center)

    fj = jax.jit(f)
    gj = jax.jit(jax.grad(f))
    x0 = jnp.asarray(coords, jnp.float32)
    ana = np.asarray(gj(x0))
    worst = 0.0
    for i in range(min(n_atoms, len(coords))):
        for ax in range(3):
            d = np.zeros_like(np.asarray(coords), dtype=np.float32)
            d[i, ax] = eps
            fp = float(fj(x0 + d))
            fm = float(fj(x0 - d))
            num = (fp - fm) / (2 * eps)
            denom = max(abs(num), abs(float(ana[i, ax])), 1e-6)
            rel = abs(num - float(ana[i, ax])) / denom
            worst = max(worst, rel)
            log.write(f"gradient_check atom {i} axis {ax}: analytic "
                      f"{float(ana[i, ax]):+.6f} numeric {num:+.6f} "
                      f"rel {rel:.3e}\n")
    log.write(f"gradient_check max relative error: {worst:.3e}\n")
    return worst
