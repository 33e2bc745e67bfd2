"""Receptor-typing parity probe (VERDICT r2 weak #4).

noelem score_only gives -6.95 here vs the reference's < -8 bar; round-2
isolated the residual to receptor-side typing (repulsion +4.29 is the
biggest suspect).  This script ranks receptor atoms by their per-term
contribution at the crystal pose and prints their residue/name/assigned
type so wrong templates stand out.

Usage: JAX_PLATFORMS=cpu python scripts/typing_parity_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from gnina_tpu.chem import ingest, sdf
    from gnina_tpu.chem.tree_build import build_tree_from_molecule
    from gnina_tpu.constants import DEFAULT_TABLE, IS_HYDROGEN
    from gnina_tpu.scoring.atom_terms import per_atom_term_values
    from gnina_tpu.scoring.builtin import get_scoring_function

    data = "/root/reference/test/gnina/data"
    rec = ingest.Receptor.from_file(f"{data}/noelem_rec.pdb")
    mol = list(sdf.iter_sdf(f"{data}/noelem.sdf"))[0]
    lig = build_tree_from_molecule(mol)
    sf = get_scoring_function("vina")

    # roles swapped: per-RECEPTOR-atom values against the ligand
    vals = per_atom_term_values(sf, rec.types, rec.coords, rec.charges,
                                lig.types, lig.orig_coords, lig.charges)
    names = ["gauss1", "gauss2", "repulsion", "hydrophobic", "hbond"]
    tot = vals.sum(axis=0)
    print("weighted inter totals:",
          " ".join(f"{n}={v:+.3f}" for n, v in zip(names, tot)),
          f"sum={tot.sum():+.3f}")

    recmol = rec.mol
    print("\ntop receptor atoms by |contribution|:")
    score = np.abs(vals).sum(axis=1)
    for i in np.argsort(-score)[:25]:
        a = recmol.atoms[i]
        t = int(rec.types[i])
        print(f"  {a.resname:>4s}{a.resnum:4d} {a.name:<4s} "
              f"type={DEFAULT_TABLE.smina_names[t]:<24s} "
              f"rep={vals[i, 2]:+7.3f} g1={vals[i, 0]:+6.3f} "
              f"hyd={vals[i, 3]:+6.3f} hb={vals[i, 4]:+6.3f}")

    print("\nper-residue repulsion:")
    by_res = {}
    for i in range(len(rec.types)):
        a = recmol.atoms[i]
        key = (a.resname, a.resnum)
        by_res[key] = by_res.get(key, 0.0) + vals[i, 2]
    for key, v in sorted(by_res.items(), key=lambda kv: -abs(kv[1]))[:10]:
        print(f"  {key[0]:>4s}{key[1]:5d} repulsion {v:+8.3f}")

    # how are the NAP cofactor atoms typed?
    print("\nNAP cofactor typing:")
    for i in range(len(rec.types)):
        a = recmol.atoms[i]
        if a.resname == "NAP":
            t = int(rec.types[i])
            print(f"  {a.name:<4s} anum={a.anum:2d} "
                  f"type={DEFAULT_TABLE.smina_names[t]}")


if __name__ == "__main__":
    main()
