"""Audit protein-template typing against an ADT-prepared receptor PDBQT.

/root/reference/test/gnina/data/GSK3B_DFG_out_35-388-processed_rigid.pdbqt is
a full protein receptor prepared with AutoDockTools: its AD element types
(col 78-79) are the ground truth the reference's OB->PDBQT receptor path
produces for standard residues.  Compare them with the AD name our
template/perception pipeline would assign per (resname, atomname).

Usage: JAX_PLATFORMS=cpu python scripts/template_audit.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ELEM = {"N": 7, "C": 6, "O": 8, "S": 16, "H": 1}


def our_ename(resname, atomname):
    from gnina_tpu.chem.protein import is_standard_residue, protein_atom_flags

    anum = ELEM.get(atomname[0], 0)
    if anum == 0:
        return "?"
    if anum == 1:
        return "HD"
    if not is_standard_residue(resname):
        return "?!template-miss"
    donor, acceptor, aromatic = protein_atom_flags(resname, atomname, anum)
    if anum == 6:
        return "A" if aromatic else "C"
    if anum == 8:
        return "OA"
    if anum == 7:
        return "NA" if acceptor else "N"
    if anum == 16:
        return "SA" if acceptor else "S"
    return "?"


def main():
    rows = []
    path = ("/root/reference/test/gnina/data/"
            "GSK3B_DFG_out_35-388-processed_rigid.pdbqt")
    with open(path) as f:
        for line in f:
            if not line.startswith(("ATOM", "HETATM")):
                continue
            res = line[17:20].strip()
            an = line[12:16].strip()
            t = line[77:79].strip()
            rows.append((res, an, t))
    table = sorted(set(rows))
    n_bad = 0
    for res, an, t in table:
        ours = our_ename(res, an)
        if ours != t:
            n_bad += 1
            print(f"MISMATCH {res:>4s} {an:<4s} adt={t:<3s} ours={ours}")
    print(f"\n{len(table)} unique (res,atom) rows, {n_bad} mismatches")


if __name__ == "__main__":
    main()
