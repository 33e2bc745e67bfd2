"""Voxelizer correctness vs a naive numpy reference implementation."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from gnina_tpu.models.typer import default_lig_typer, default_rec_typer
from gnina_tpu.ops.voxelize import density_at, grid_points_1d, voxelize

pytestmark = pytest.mark.slow  # compiles big device programs


def naive_voxelize(coords, channels, radii, mask, center, num_channels,
                   npoints, resolution):
    """Straight 4-loop reference of the libmolgrid density model."""
    origin = np.asarray(center) - resolution * (npoints - 1) / 2.0
    out = np.zeros((num_channels, npoints, npoints, npoints), np.float32)
    e2 = np.exp(-2.0)
    for a in range(len(coords)):
        if not mask[a] or channels[a] < 0:
            continue
        r = radii[a]
        for i in range(npoints):
            for j in range(npoints):
                for k in range(npoints):
                    p = origin + resolution * np.array([i, j, k])
                    d = np.linalg.norm(p - coords[a])
                    if d <= r:
                        v = np.exp(-2.0 * d * d / (r * r))
                    elif d <= 1.5 * r:
                        dr = d / r
                        v = 4 * e2 * dr * dr - 12 * e2 * dr + 9 * e2
                    else:
                        v = 0.0
                    out[channels[a], i, j, k] += v
    return out


@pytest.mark.smoke
def test_voxelize_matches_naive():
    rng = np.random.RandomState(0)
    n = 5
    coords = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    channels = np.array([0, 1, 1, -1, 2], np.int32)
    radii = np.array([1.7, 1.9, 1.5, 1.0, 2.0], np.float32)
    mask = np.array([True, True, True, True, False])
    center = np.zeros(3, np.float32)

    got = np.asarray(voxelize(jnp.asarray(coords), jnp.asarray(channels),
                              jnp.asarray(radii), jnp.asarray(mask),
                              jnp.asarray(center), num_channels=3,
                              npoints=12, resolution=0.5))
    want = naive_voxelize(coords, channels, radii, mask, center, 3, 12, 0.5)
    assert got.shape == (3, 12, 12, 12)
    assert np.abs(got - want).max() < 1e-4


def test_density_continuity():
    """Value and derivative continuous at d = r (the gaussian/quadratic
    junction libmolgrid engineered)."""
    r = 1.8
    eps = 1e-4
    below = float(density_at(jnp.float32((r - eps) ** 2), jnp.float32(r)))
    above = float(density_at(jnp.float32((r + eps) ** 2), jnp.float32(r)))
    assert abs(below - above) < 1e-3
    assert abs(below - np.exp(-2.0)) < 1e-3
    # zero beyond 1.5r
    assert float(density_at(jnp.float32((1.5 * r + 0.01) ** 2), jnp.float32(r))) == 0.0


def test_voxelize_gradient_finite_diff():
    coords = jnp.asarray(np.array([[0.3, -0.2, 0.5]], np.float32))
    channels = jnp.asarray(np.array([0], np.int32))
    radii = jnp.asarray(np.array([1.8], np.float32))
    mask = jnp.asarray(np.array([True]))
    center = jnp.zeros(3, jnp.float32)
    g_target = np.random.RandomState(1).rand(1, 8, 8, 8).astype(np.float32)

    def loss(c):
        g = voxelize(c, channels, radii, mask, center, num_channels=1,
                     npoints=8, resolution=0.5)
        return jnp.sum(g * g_target)

    grad = np.asarray(jax.grad(loss)(coords))
    h = 1e-3
    for ax in range(3):
        cp = np.array(coords)
        cp[0, ax] += h
        cm = np.array(coords)
        cm[0, ax] -= h
        fd = (float(loss(jnp.asarray(cp))) - float(loss(jnp.asarray(cm)))) / (2 * h)
        assert abs(grad[0, ax] - fd) < 5e-2, (ax, grad[0, ax], fd)


def test_default_typer_channels():
    rt = default_rec_typer()
    lt = default_lig_typer()
    assert rt.num_channels == 14
    assert lt.num_channels == 14
    from gnina_tpu.constants import SminaType
    # hydrogens unmapped
    assert rt.table[SminaType.Hydrogen] == -1
    assert rt.table[SminaType.PolarHydrogen] == -1
    # chlorine shares the halogen channel in recmap but not ligmap
    assert rt.table[SminaType.Chlorine] == rt.table[SminaType.Bromine]
    assert lt.table[SminaType.Chlorine] != lt.table[SminaType.Bromine]


def test_windowed_matches_full():
    """voxelize_windowed is EXACT vs voxelize given x-sorted atoms and a
    slab_window_size width (atoms beyond 1.5*r of a slab contribute 0)."""
    from gnina_tpu.ops.voxelize import slab_window_size, voxelize_windowed

    rng = np.random.RandomState(7)
    a = 64
    coords = (rng.rand(a, 3).astype(np.float32) - 0.5) * 24.0
    channels = rng.randint(0, 4, a).astype(np.int32)
    radii = (1.2 + rng.rand(a).astype(np.float32))
    mask = rng.rand(a) > 0.2
    # masked rows pushed to far x like the scorer does
    sx = np.where(mask, coords[:, 0], np.float32(1e9))
    order = np.argsort(sx, kind="stable")
    coords, channels, radii, mask = (coords[order], channels[order],
                                     radii[order], mask[order])
    center = np.zeros(3, np.float32)
    reach = 1.5 * float(radii.max()) + 0.5
    win = slab_window_size(np.where(mask, coords[:, 0], 1e9), reach,
                           pad_to=8)
    assert win < a  # the window must actually cut work on this layout
    full = voxelize(jnp.asarray(coords), jnp.asarray(channels),
                    jnp.asarray(radii), jnp.asarray(mask),
                    jnp.asarray(center), num_channels=4, npoints=24,
                    resolution=0.5)
    wing = voxelize_windowed(jnp.asarray(coords), jnp.asarray(channels),
                             jnp.asarray(radii), jnp.asarray(mask),
                             jnp.asarray(center), num_channels=4,
                             window=win, npoints=24, resolution=0.5)
    np.testing.assert_allclose(np.asarray(wing), np.asarray(full),
                               atol=1e-5)
