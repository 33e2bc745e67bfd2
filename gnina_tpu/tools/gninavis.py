"""CNN attribution by masking (gninavis equivalent).

reference: gninasrc/gninavis/cnn_visualization.cpp — per-atom and
per-fragment masking: remove atoms, re-score with the CNN, and report the
score drop as that atom's contribution.  TPU-native difference: all masked
variants are scored in ONE batched CNN forward instead of sequential
re-scoring.

Outputs a PDB whose B-factor column carries the per-atom scores (the
reference writes "colored" PDBs the same way).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from gnina_tpu.chem import ingest
from gnina_tpu.constants import IS_HYDROGEN


def atom_masking_scores(cnn, rec, lig, coords: Optional[np.ndarray] = None
                        ) -> np.ndarray:
    """Per-ligand-atom attribution: base_score - score(without atom).

    Hydrogens get the score of their heavy neighbor region (0 here).
    """
    if coords is None:
        coords = lig.orig_coords
    n = lig.num_atoms
    heavy_ids = [i for i in range(n) if not IS_HYDROGEN[lig.types[i]]]

    base, _aff, _var = cnn.score_pose(rec, lig, coords)

    # batched masked variants: move the masked atom far outside the grid
    # (equivalent to removing it from the coordinate set)
    batch = np.tile(coords[None], (len(heavy_ids), 1, 1))
    for row, i in enumerate(heavy_ids):
        batch[row, i] = coords[i] + 1e4
    scores, _affs, _loss, _vars = cnn.score_poses(rec, lig, batch)

    out = np.zeros(n, np.float32)
    for row, i in enumerate(heavy_ids):
        out[i] = base - float(scores[row])
    return out


def fragment_masking_scores(cnn, rec, lig, fragments: List[List[int]],
                            coords: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-fragment attribution: score drop when a whole fragment is
    removed; returned per atom (each atom gets its fragment's score)."""
    if coords is None:
        coords = lig.orig_coords
    base, _aff, _var = cnn.score_pose(rec, lig, coords)
    batch = np.tile(coords[None], (len(fragments), 1, 1))
    for row, frag in enumerate(fragments):
        for i in frag:
            batch[row, i] = coords[i] + 1e4
    scores, _affs, _loss, _vars = cnn.score_poses(rec, lig, batch)
    out = np.zeros(lig.num_atoms, np.float32)
    for row, frag in enumerate(fragments):
        for i in frag:
            out[i] = base - float(scores[row])
    return out


def node_fragments(lig) -> List[List[int]]:
    """Rigid-fragment partition from the kinematic tree nodes."""
    frags = {}
    for i in range(lig.num_atoms):
        frags.setdefault(int(lig.node_id[i]), []).append(i)
    return list(frags.values())


def write_colored_pdb(lig, scores: np.ndarray, path: str):
    from gnina_tpu.chem import elements as el

    with open(path, "w") as f:
        for i in range(lig.num_atoms):
            a = lig.mol.atoms[i]
            sym = el.ANUM_TO_SYMBOL.get(a.anum, "C")
            x, y, z = lig.orig_coords[i]
            f.write(f"HETATM{i + 1:5d} {sym:<4s}LIG A   1    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{scores[i]:6.2f}"
                    f"          {sym:>2s}\n")
        f.write("END\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gninavis")
    p.add_argument("-r", "--receptor", required=True)
    p.add_argument("-l", "--ligand", required=True)
    p.add_argument("--cnn", action="append", default=[])
    p.add_argument("--atoms_only", action="store_true")
    p.add_argument("--frags_only", action="store_true")
    p.add_argument("-o", "--out", default="gninavis")
    args = p.parse_args(argv)

    from gnina_tpu.models.scorer import CNNScorer

    rec = ingest.Receptor.from_file(args.receptor)
    cnn = CNNScorer(model_names=args.cnn or None)
    for idx, lig in enumerate(ingest.iter_ligands(args.ligand)):
        if not args.frags_only:
            s = atom_masking_scores(cnn, rec, lig)
            write_colored_pdb(lig, s, f"{args.out}_{idx}_atoms.pdb")
        if not args.atoms_only:
            s = fragment_masking_scores(cnn, rec, lig, node_fragments(lig))
            write_colored_pdb(lig, s, f"{args.out}_{idx}_frags.pdb")
    return 0


if __name__ == "__main__":
    sys.exit(main())
