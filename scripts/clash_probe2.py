"""Phase-2 probe for ROADMAP gap 7: isolate FK vs energy vs line search
at a CLASH conf (noelem fixture, ligand root on a receptor atom).

Replicates the fused kernel's energy math in numpy (heavy-only atoms,
direct dx^2+dy^2+dz^2 distances) and compares with:
  - the XLA path (matmul-identity r^2: |a|^2+|b|^2-2ab, which suffers
    catastrophic cancellation at clash distances), and
  - the kernel's own f0 (debug_grad).

Usage: JAX_PLATFORMS=cpu python scripts/clash_probe2.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np


def np_kernel_energy(coords_h, pack, v_inter, v_intra, lo, hi, terms):
    """Numpy replica of the kernel's energy() for lane 0 (heavy atoms)."""
    EPS = 2.22507e-308 ** 0  # placeholder; use f32 epsilon below
    EPSILON_FL = np.float32(1.1920929e-07)
    rec = np.asarray(pack.rec)          # (K, 8)
    ap = np.asarray(pack.ap)[:, :, 0]   # (6, N)
    imask = np.asarray(pack.imask)[:, :, 0]
    n = ap.shape[1]
    e_tot = 0.0
    per_atom = []
    for a in range(n):
        heavy = ap[4, a]
        if heavy == 0.0:
            per_atom.append(0.0)
            continue
        c = coords_h[:, a]
        adj = np.clip(c, lo, hi)
        oob = np.abs(c - adj).sum()
        dx = adj[0] - rec[:, 0]
        dy = adj[1] - rec[:, 1]
        dz = adj[2] - rec[:, 2]
        r2 = dx * dx + dy * dy + dz * dz
        r = np.sqrt(np.maximum(r2, 1e-12))
        d_ = r - (ap[0, a] + rec[:, 3])
        e = np.zeros_like(r)
        for off, width, w in terms.gauss:
            dd = (d_ - off) / width
            e += w * np.exp(-dd * dd)
        for off, w in terms.repulsion:
            dd = d_ - off
            e += w * np.where(dd < 0, dd * dd, 0.0)
        fac_hyd = ap[1, a] * rec[:, 4]
        fac_hb = np.minimum(ap[2, a] * rec[:, 6] + ap[3, a] * rec[:, 5], 1.0)
        for (good, bad, w), fac in ([(t, fac_hyd) for t in terms.hydrophobic]
                                    + [(t, fac_hb) for t in terms.hbond]):
            frac = (d_ - bad) / (good - bad)
            e += w * fac * np.clip(frac, 0.0, 1.0)
        valid = (r2 < terms.cutoff_sqr) & (rec[:, 7] > 0)
        e_a = np.where(valid, e, 0.0).sum()
        # per-atom curl at v_inter
        if e_a > 0:
            e_a = e_a * v_inter / max(v_inter + e_a, EPSILON_FL)
        per_atom.append(float(e_a))
        e_tot += e_a  # slope = 0 in the probe
    e_inter = e_tot
    # intra: dense masked, per-pair curl at v_intra
    e_intra = 0.0
    for a in range(n):
        c = coords_h[:, a]
        dx = c[0] - coords_h[0]
        dy = c[1] - coords_h[1]
        dz = c[2] - coords_h[2]
        r2 = dx * dx + dy * dy + dz * dz
        r = np.sqrt(np.maximum(r2, 1e-12))
        d_ = r - (ap[0, a] + ap[0])
        e = np.zeros_like(r)
        for off, width, w in terms.gauss:
            dd = (d_ - off) / width
            e += w * np.exp(-dd * dd)
        for off, w in terms.repulsion:
            dd = d_ - off
            e += w * np.where(dd < 0, dd * dd, 0.0)
        fac_hyd = ap[1, a] * ap[1]
        fac_hb = np.minimum(ap[2, a] * ap[3] + ap[3, a] * ap[2], 1.0)
        for (good, bad, w), fac in ([(t, fac_hyd) for t in terms.hydrophobic]
                                    + [(t, fac_hb) for t in terms.hbond]):
            frac = (d_ - bad) / (good - bad)
            e += w * fac * np.clip(frac, 0.0, 1.0)
        ec = np.where(e > 0, e * v_intra / np.maximum(v_intra + e, 1e-7), e)
        valid = np.where(r2 < terms.cutoff_sqr, imask[a], 0.0)
        e_intra += 0.5 * (valid * ec).sum()
    return e_inter, float(e_intra), np.asarray(per_atom)


def main():
    import jax
    import jax.numpy as jnp

    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.docking import (DockingEngine, DockSettings, pad_ligand,
                                   pad_receptor, _round_up)
    from gnina_tpu.ops import fk
    from gnina_tpu.ops import mc_fused
    from gnina_tpu.ops import pallas_dock as pdk
    from gnina_tpu.scoring.builtin import get_scoring_function
    from gnina_tpu.ops.energy import Box
    from gnina_tpu.types import Conf

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    center, size = ingest.autobox_ligand(f"{data}/noelem.sdf")
    d = np.linalg.norm(rec.coords - np.asarray(center)[None, :], axis=1)
    keep = np.argsort(d)[:250]
    rec = dataclasses.replace(rec, coords=rec.coords[keep],
                              types=rec.types[keep],
                              charges=rec.charges[keep])

    sf = get_scoring_function("vina")
    eng = DockingEngine(DockSettings(cnn_scoring="none"))

    kk = _round_up(len(rec.types), 128)
    rc = np.zeros((kk, 3), np.float32)
    rc[:len(rec.coords)] = rec.coords
    rt = np.zeros((kk,), np.int32)
    rt[:len(rec.types)] = rec.types
    rq = np.zeros((kk,), np.float32)
    rm = np.zeros((kk,), np.float32)
    rm[:len(rec.types)] = 1.0
    pack = pdk.build_pack([lig], rc, rt, rq, rm, 1, sf.table)
    terms = pdk.extract_vina_terms(sf)

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
    box = Box(lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32))

    # ---- 1. FK parity: fk_packed (XLA twin of kernel fk) vs fk_coords ----
    max_layers = _round_up(
        max(int(lig.layer.max()) if lig.num_nodes > 1 else 1, 1), 4)
    n_pad = _round_up(lig.num_atoms, 8)
    lig_d = pad_ligand(lig, n_pad, m, _round_up(max(len(lig.pairs), 1), 32))
    rec_d = pad_receptor(rc, rt, rq, kk)

    rigid, tors = pdk.conf_to_packed(
        jax.tree_util.tree_map(lambda a: a[None], conf), m)
    coords_k = np.asarray(pdk.fk_packed(rigid, tors, pack))[:, :, 0]  # (3,N)
    coords_x_full = np.asarray(fk.fk_coords(lig_d, conf, max_layers))  # (N,3)
    hidx = pack.heavy_idx[0]
    hsel = hidx[hidx >= 0]
    coords_x_h = coords_x_full[hsel].T  # (3, nh)
    nh = len(hsel)
    fkerr = np.abs(coords_k[:, :nh] - coords_x_h).max()
    print(f"FK parity (kernel-twin vs XLA) at clash conf: max {fkerr:.2e} A")

    # ---- 2. numpy replica of kernel energy -------------------------------
    e_inter, e_intra, per_atom = np_kernel_energy(
        coords_k, pack, 10.0, 10.0, lo, hi, terms)
    print(f"NP-kernel  inter={e_inter:.4f} intra={e_intra:.4f} "
          f"total={e_inter + e_intra:.4f}")

    # ---- 3. XLA path components ------------------------------------------
    efn = eng._make_efn(max_layers)
    coords_x = fk.fk_coords(lig_d, conf, max_layers)
    e_int_x = float(efn.inter_on_coords(lig_d, rec_d, coords_x, box, 0.0,
                                        jnp.float32(10.0)))
    e_ira_x = float(efn.eval_intra(lig_d, conf, jnp.float32(10.0)))
    print(f"XLA        inter={e_int_x:.4f} intra={e_ira_x:.4f} "
          f"total={e_int_x + e_ira_x:.4f}")

    # XLA intra on HEAVY pairs only (kernel drops pairs with an H endpoint)
    import jax.numpy as jnp2
    pm = np.asarray(lig_d.pair_mask).copy()
    pa_ = np.asarray(lig_d.pair_a)
    pb_ = np.asarray(lig_d.pair_b)
    hmask_full = np.asarray(lig_d.heavy_mask)
    pm_h = pm & hmask_full[pa_] & hmask_full[pb_]
    lig_h = lig_d._replace(pair_mask=jnp2.asarray(pm_h))
    e_ira_xh = float(efn.eval_intra(lig_h, conf, jnp2.float32(10.0)))
    print(f"XLA intra heavy-pairs-only = {e_ira_xh:.4f} "
          f"(H-pair contribution = {e_ira_x - e_ira_xh:.4f})")

    # ---- 3b. cancellation check: numpy replica of the XLA r^2 identity ---
    adj = np.clip(coords_x_full, lo, hi).astype(np.float32)
    recc = np.asarray(rec_d.coords, np.float32)
    r2_mm = (np.sum(adj * adj, axis=1, dtype=np.float32)[:, None]
             + np.sum(recc * recc, axis=1, dtype=np.float32)[None, :]
             - 2.0 * (adj @ recc.T).astype(np.float32))
    dx_ = adj[:, None, :] - recc[None, :, :]
    r2_ex = np.sum(dx_ * dx_, axis=-1, dtype=np.float32)
    close = r2_ex < 4.0
    if close.any():
        err = np.abs(r2_mm - r2_ex)[close]
        print(f"r2 identity-vs-exact (pairs r<2A): max abs err "
              f"{err.max():.4f}, mean {err.mean():.4f} "
              f"({close.sum()} close pairs)")

    # ---- 4. kernel f0 + full stats at maxiters=1 --------------------------
    fker = pdk.FusedBfgs(sf, pack, maxiters=1, want_metro=False,
                         interpret=True,
                         n_iter=int((pack.heavy_idx >= 0).sum()))
    scal = fker.scal(10.0, 10.0, 0.0, 1000.0, jnp.asarray(lo),
                     jnp.asarray(hi))
    org, otr, st, oc = fker(rigid, tors, scal, pack=pack)
    st = np.asarray(st)
    print(f"KERNEL f_out={st[0, 0]:.4f} metro={st[1, 0]:.4f} "
          f"cnt_trials={st[2, 0]:.0f} cnt_iters={st[3, 0]:.0f}")
    print("stats rows 0..7 lane0:", np.array2string(st[:, 0], precision=4))


if __name__ == "__main__":
    main()
