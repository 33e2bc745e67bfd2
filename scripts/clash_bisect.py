"""Minimal bisect of the XLA-vs-kernel inter energy gap for one clash atom.

Compares, for ligand atom full_idx=17 of the noelem clash conf:
  - r vectors: XLA matmul-identity r2 vs exact differences
  - valid masks
  - pair energies at each r
  - raw and curled per-atom sums
Usage: JAX_PLATFORMS=cpu python scripts/clash_bisect.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import (DockingEngine, DockSettings, pad_ligand,
                                   pad_receptor, _round_up)
    from gnina_tpu.ops import fk
    from gnina_tpu.ops import pallas_dock as pdk
    from gnina_tpu.scoring.builtin import get_scoring_function
    from gnina_tpu.ops.energy import Box, gather_params, _type_param_arrays
    from gnina_tpu.types import Conf

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep], charges=rec.charges[keep])
    sf = get_scoring_function("vina")
    kk = _round_up(len(rec.types), 128)
    rc = np.zeros((kk, 3), np.float32)
    rc[:len(rec.coords)] = rec.coords
    rt = np.zeros((kk,), np.int32)
    rt[:len(rec.types)] = rec.types
    rq = np.zeros((kk,), np.float32)
    rm = np.zeros((kk,), np.float32)
    rm[:len(rec.types)] = 1.0
    pack = pdk.build_pack([lig], rc, rt, rq, rm, 1, sf.table)
    n, m, ly, kdim, l_pad = pdk._static_dims(pack)
    tp = m - 1
    rng = np.random.default_rng(0)
    lo = np.asarray(center) - np.asarray(size) / 2
    hi = np.asarray(center) + np.asarray(size) / 2
    clash_pos = rec.coords[np.argmin(d[keep])].astype(np.float32)
    conf = Conf(position=jnp.asarray(clash_pos),
                orientation=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                torsions=jnp.asarray(
                    rng.uniform(-np.pi, np.pi, tp).astype(np.float32)))
    max_layers = _round_up(
        max(int(lig.layer.max()) if lig.num_nodes > 1 else 1, 1), 4)
    n_pad = _round_up(lig.num_atoms, 8)
    lig_d = pad_ligand(lig, n_pad, m, _round_up(max(len(lig.pairs), 1), 32))
    rec_d = pad_receptor(rc, rt, rq, kk)
    print("rec_d.mask sum:", int(np.asarray(rec_d.mask).sum()), "of", kk,
          flush=True)
    coords_x = np.asarray(fk.fk_coords(lig_d, conf, max_layers))

    ai = 17
    adj = np.clip(coords_x[ai], lo, hi).astype(np.float32)
    recc = np.asarray(rec_d.coords, np.float32)
    # exact r2
    dx = adj[None, :] - recc
    r2_ex = np.sum(dx * dx, axis=1, dtype=np.float32)
    # matmul-identity r2 (what inter_energy computes)
    r2_mm = (np.sum(adj * adj, dtype=np.float32)
             + np.sum(recc * recc, axis=1, dtype=np.float32)
             - 2.0 * (recc @ adj).astype(np.float32))
    print("max |r2_mm - r2_ex| (r<3A):",
          float(np.abs(r2_mm - r2_ex)[r2_ex < 9].max()), flush=True)

    r = np.sqrt(np.maximum(r2_ex, 1e-12))
    tables = _type_param_arrays(sf)
    pl_ = gather_params(tables, lig_d.types)
    pa = {k: (jnp.asarray(np.asarray(v)[ai])[None]
              if np.asarray(v).ndim == 1 else v) for k, v in pl_.items()}
    pr_ = gather_params(tables, rec_d.types)
    pb = {k: (jnp.asarray(v)[None, :] if np.asarray(v).ndim == 1 else v)
          for k, v in pr_.items()}
    e_pair = np.asarray(sf.eval_pair(
        pa, pb, jnp.asarray(r)[None, :],
        qa=jnp.asarray(np.asarray(lig_d.charges)[ai]).reshape(1, 1),
        qb=jnp.asarray(rec_d.charges)[None, :]))[0]
    valid_x = (r2_ex < sf.cutoff ** 2) & np.asarray(rec_d.mask)
    raw = float(np.where(valid_x, e_pair, 0).sum())
    curled = raw * 10.0 / (10.0 + raw) if raw > 0 else raw
    print(f"np-of-XLA atom17: raw={raw:.4f} curled={curled:.4f}", flush=True)

    # kernel-side replica for the same atom (heavy row 16)
    recp = np.asarray(pack.rec)
    ap = np.asarray(pack.ap)[:, :, 0]
    a = 16
    import gnina_tpu.ops.pallas_dock as _p
    terms = _p.extract_vina_terms(sf)
    rigid, tors = pdk.conf_to_packed(
        jax.tree_util.tree_map(lambda x: x[None], conf), m)
    ck = np.asarray(pdk.fk_packed(rigid, tors, pack))[:, a, 0]
    c = np.clip(ck, lo, hi)
    dxk = c[0] - recp[:, 0]
    dyk = c[1] - recp[:, 1]
    dzk = c[2] - recp[:, 2]
    r2k = dxk * dxk + dyk * dyk + dzk * dzk
    rk = np.sqrt(np.maximum(r2k, 1e-12))
    d_ = rk - (ap[0, a] + recp[:, 3])
    e_np = np.zeros_like(rk)
    for off, width, w in terms.gauss:
        e_np += w * np.exp(-(((d_ - off) / width) ** 2))
    for off, w in terms.repulsion:
        dd = d_ - off
        e_np += w * np.where(dd < 0, dd * dd, 0.0)
    fac_hyd = ap[1, a] * recp[:, 4]
    fac_hb = np.minimum(ap[2, a] * recp[:, 6] + ap[3, a] * recp[:, 5], 1.0)
    for (good, bad, w), fac in ([(t, fac_hyd) for t in terms.hydrophobic]
                                + [(t, fac_hb) for t in terms.hbond]):
        frac = (d_ - bad) / (good - bad)
        e_np += w * fac * np.clip(frac, 0, 1)
    valid_k = (r2k < terms.cutoff_sqr) & (recp[:, 7] > 0)
    rawk = float(np.where(valid_k, e_np, 0).sum())
    curledk = rawk * 10.0 / (10.0 + rawk) if rawk > 0 else rawk
    print(f"np-kernel atom17: raw={rawk:.4f} curled={curledk:.4f}",
          flush=True)

    # where do the valid masks / coords differ?
    print("adj (xla):", adj, " adj (kernel):", c, flush=True)
    both = valid_x | valid_k
    dd = np.where(both, np.where(valid_k, e_np, 0)
                  - np.where(valid_x, e_pair, 0), 0)
    bad = np.argsort(-np.abs(dd))[:6]
    for b in bad:
        print(f"rec#{b} type={rt[b]} r_x={r[b]:.3f} r_k={rk[b]:.3f} "
              f"vx={valid_x[b]} vk={valid_k[b]} e_x={e_pair[b]:.4f} "
              f"e_k={e_np[b]:.4f} dd={dd[b]:.4f}", flush=True)


if __name__ == "__main__":
    main()
