"""Result rendering: poses -> SDF/PDBQT with gnina's SD tags.

Replaces the reference's result_info (gninasrc/lib/result_info.cpp): output
molecules carry minimizedAffinity / CNNscore / CNNaffinity / CNNvariance
(and RMSD for --local_only) data fields.
"""

from __future__ import annotations

from typing import List, Optional

from gnina_tpu.chem.sdf import write_sdf_block
from gnina_tpu.chem.tree_build import LigandStruct


def pose_properties(result, cnn_enabled: bool) -> dict:
    props = {"minimizedAffinity": f"{result.energy:.5f}"}
    if result.rmsd >= 0:
        props["RMSD"] = f"{result.rmsd:.5f}"
    if cnn_enabled:
        props["CNNscore"] = f"{result.cnnscore:.10f}"
        props["CNNaffinity"] = f"{result.cnnaffinity:.10f}"
        props["CNN_VS"] = f"{result.cnnscore * result.cnnaffinity:.10f}"
        props["CNNvariance"] = f"{result.cnnvariance:.10f}"
    return props


def write_poses_sdf(lig: LigandStruct, results: List, cnn_enabled: bool,
                    model_name: Optional[str] = None) -> str:
    out = []
    for r in results:
        props = pose_properties(r, cnn_enabled)
        out.append(write_sdf_block(lig.mol, coords=r.coords, properties=props,
                                   name=model_name if model_name is not None
                                   else lig.name))
    return "".join(out)


def write_flex_pdb(lig: LigandStruct, results: List) -> str:
    """Flexible-residue poses as multi-MODEL PDB (--out_flex; reference:
    result_info.cpp writeFlex).  Each pose writes every flex residue's
    movable atoms at their docked coordinates."""
    if not lig.flex_meta:
        return ""
    out = []
    for mi, r in enumerate(results):
        out.append(f"MODEL     {mi + 1:4d}\n")
        serial = 1
        for meta in lig.flex_meta:
            key, resname, start, end = meta[0], meta[1], meta[2], meta[3]
            fr = meta[4] if len(meta) > 4 else None
            chain = key[0] if isinstance(key, tuple) else "A"
            resnum = key[1] if isinstance(key, tuple) else 1
            for k in range(start, end):
                name = ""
                element = ""
                if fr is not None and fr.atoms_mol is not None \
                        and k - start < len(fr.atoms_mol.atoms):
                    a = fr.atoms_mol.atoms[k - start]
                    name = a.name or ""
                    element = a.element_name or ""
                x, y, z = (float(v) for v in r.coords[k])
                nm = name if len(name) >= 4 else f" {name:<3s}"
                out.append(
                    f"ATOM  {serial:5d} {nm:<4s}{resname:>4s} "
                    f"{str(chain)[:1]:1s}{int(resnum):4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}"
                    f"          {element:>2s}\n")
                serial += 1
        out.append("ENDMDL\n")
    return "".join(out)
