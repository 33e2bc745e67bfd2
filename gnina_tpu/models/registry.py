"""CNN model registry: names, ensembles, lazy conversion, caching.

Mirrors the reference's embedded-model table and ensemble-expansion logic
(reference: gninasrc/lib/cnn_torch_scorer.cpp:28-66, torch_models.h).  Model
weights are converted from the reference TorchScript checkpoints into
spec.json + npz pairs; converted copies of the common ensembles ship with
the package, the rest convert on demand (requires torch + the checkpoint
directory).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from gnina_tpu.models.typer import (ChannelTyper, DEFAULT_LIGMAP,
                                    DEFAULT_RECMAP, default_lig_typer,
                                    default_rec_typer)

# filenames in the reference models directory (dots become underscores in
# model names, matching make_model_cpp.py)
_MODELS_DIR_CANDIDATES = [
    os.environ.get("GNINA_TPU_TORCH_MODELS", ""),
    "/root/reference/gninasrc/lib/models",
]
_PACKAGE_DATA = os.path.join(os.path.dirname(__file__), "..", "data", "models")
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "gnina_tpu", "models")

ALL_MODEL_FILES = [
    "all_default_to_default_1.3_1", "all_default_to_default_1.3_2",
    "all_default_to_default_1.3_3", "crossdock_default2018",
    "crossdock_default2018_1.3", "crossdock_default2018_1.3_1",
    "crossdock_default2018_1.3_2", "crossdock_default2018_1.3_3",
    "crossdock_default2018_1.3_4", "crossdock_default2018_1",
    "crossdock_default2018_2", "crossdock_default2018_3",
    "crossdock_default2018_4", "crossdock_default2018_KD_1",
    "crossdock_default2018_KD_2", "crossdock_default2018_KD_3",
    "crossdock_default2018_KD_4", "crossdock_default2018_KD_5",
    "default2017", "dense", "dense_1.3", "dense_1.3_1", "dense_1.3_2",
    "dense_1.3_3", "dense_1.3_4", "dense_1.3_PT_KD", "dense_1.3_PT_KD_1",
    "dense_1.3_PT_KD_2", "dense_1.3_PT_KD_3", "dense_1.3_PT_KD_4",
    "dense_1.3_PT_KD_def2018", "dense_1.3_PT_KD_def2018_1",
    "dense_1.3_PT_KD_def2018_2", "dense_1.3_PT_KD_def2018_3",
    "dense_1.3_PT_KD_def2018_4", "dense_1", "dense_2", "dense_3", "dense_4",
    "general_default2018", "general_default2018_1", "general_default2018_2",
    "general_default2018_3", "general_default2018_4",
    "general_default2018_KD_1", "general_default2018_KD_2",
    "general_default2018_KD_3", "general_default2018_KD_4",
    "general_default2018_KD_5", "redock_default2018", "redock_default2018_1.3",
    "redock_default2018_1.3_1", "redock_default2018_1.3_2",
    "redock_default2018_1.3_3", "redock_default2018_1.3_4",
    "redock_default2018_1", "redock_default2018_2", "redock_default2018_3",
    "redock_default2018_4", "redock_default2018_KD_1",
    "redock_default2018_KD_2", "redock_default2018_KD_3",
    "redock_default2018_KD_4", "redock_default2018_KD_5",
]

MODEL_NAMES = {f.replace(".", "_"): f for f in ALL_MODEL_FILES}

DEFAULT_ENSEMBLE = ["dense_1_3", "dense_1_3_PT_KD_3", "crossdock_default2018_KD_4"]
FAST_MODEL = "all_default_to_default_1_3_1"
DEFAULT_1_0_ENSEMBLE = ["dense", "general_default2018_3", "dense_3",
                        "crossdock_default2018", "redock_default2018_2"]


def expand_model_names(names: List[str]) -> List[str]:
    """Ensemble expansion (cnn_torch_scorer.cpp:28-64)."""
    if not names:
        return list(DEFAULT_ENSEMBLE)
    if len(names) == 1:
        if names[0] == "fast":
            return [FAST_MODEL]
        if names[0] == "default1.0":
            return list(DEFAULT_1_0_ENSEMBLE)
        if names[0] in ("default", "default2.0"):
            return list(DEFAULT_ENSEMBLE)
    out: List[str] = []
    for name in names:
        if name.endswith("_ensemble"):
            prefix = name[: -len("_ensemble")]
            matches = sorted(k for k in MODEL_NAMES if k.startswith(prefix))
            if not matches:
                raise KeyError(f"no models match ensemble prefix {prefix!r}")
            out.extend(matches)
        else:
            out.append(name)
    return out


@dataclasses.dataclass
class CNNModel:
    name: str
    spec: dict
    params: Dict[str, jnp.ndarray]
    rec_typer: ChannelTyper
    lig_typer: ChannelTyper
    resolution: float
    dimension: float
    radius_scale: float
    skip_softmax: bool
    apply_logistic_loss: bool

    @property
    def grid_points(self) -> int:
        return int(round(self.dimension / self.resolution)) + 1

    @property
    def num_channels(self) -> int:
        return self.rec_typer.num_channels + self.lig_typer.num_channels


def _find_converted(name: str) -> Optional[str]:
    fname = f"{name}.spec.json"
    for d in (_PACKAGE_DATA, _CACHE_DIR):
        p = os.path.join(d, fname)
        if os.path.exists(p) and os.path.exists(p.replace(".spec.json", ".npz")):
            return p
    return None


def _convert(name: str) -> str:
    from gnina_tpu.models.torchscript_import import convert_and_save

    fname = MODEL_NAMES.get(name)
    if fname is None:
        raise KeyError(f"unknown CNN model {name!r}")
    for d in _MODELS_DIR_CANDIDATES:
        if d and os.path.exists(os.path.join(d, fname + ".pt")):
            return convert_and_save(os.path.join(d, fname + ".pt"),
                                    _CACHE_DIR, name)
    raise FileNotFoundError(
        f"model {name}: no converted copy found and no TorchScript source "
        f"directory available (set GNINA_TPU_TORCH_MODELS)")


def load_model_from_file(path: str) -> CNNModel:
    """Convert + load a user-supplied TorchScript checkpoint (--cnn_model)."""
    import hashlib

    from gnina_tpu.models.torchscript_import import convert_and_save

    tag = "file_" + hashlib.sha1(path.encode()).hexdigest()[:16]
    spec_path = os.path.join(_CACHE_DIR, f"{tag}.spec.json")
    if not os.path.exists(spec_path):
        spec_path = convert_and_save(path, _CACHE_DIR, tag)
    return _load_converted(tag, spec_path)


_MODEL_CACHE = {}


def load_model(name: str) -> CNNModel:
    if name.endswith(".pt") and os.path.exists(name):
        return load_model_from_file(name)
    name = name.replace(".", "_")
    if name in _MODEL_CACHE:
        return _MODEL_CACHE[name]
    spec_path = _find_converted(name)
    if spec_path is None:
        spec_path = _convert(name)
    m = _load_converted(name, spec_path)
    _MODEL_CACHE[name] = m
    return m


def _load_converted(name: str, spec_path: str) -> CNNModel:
    from gnina_tpu.models.runtime import load_spec

    spec, params = load_spec(spec_path, spec_path.replace(".spec.json", ".npz"))
    meta = spec.get("metadata", {}) or {}
    recmap = meta.get("recmap", DEFAULT_RECMAP)
    ligmap = meta.get("ligmap", DEFAULT_LIGMAP)
    return CNNModel(
        name=name,
        spec=spec,
        params=params,
        rec_typer=ChannelTyper(recmap),
        lig_typer=ChannelTyper(ligmap),
        resolution=float(meta.get("resolution", 0.5)),
        dimension=float(meta.get("dimension", 23.5)),
        radius_scale=float(meta.get("radius_scaling", 1.0)),
        skip_softmax=bool(meta.get("skip_softmax", False)),
        apply_logistic_loss=bool(meta.get("apply_logistic_loss", False)),
    )
