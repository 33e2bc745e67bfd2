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
