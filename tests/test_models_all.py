"""All shipped CNN models load offline (VERDICT round-1 item 5).

The reference embeds 64 TorchScript checkpoints into its binary
(gninasrc/CMakeLists.txt:96-118, torch_models.h); here every model ships as
a converted npz/spec pair in package data, loadable without torch.
"""

import numpy as np
import pytest

from gnina_tpu.models.registry import MODEL_NAMES, _find_converted, \
    load_model


@pytest.mark.smoke
def test_all_models_converted_offline():
    missing = [n for n in MODEL_NAMES if not _find_converted(n)]
    assert not missing, f"models missing converted copies: {missing}"
    assert len(MODEL_NAMES) == 64  # full reference set (torch_models.h)


@pytest.mark.parametrize("name", sorted(MODEL_NAMES))
def test_load_model_metadata(name):
    m = load_model(name)
    assert m.params, name
    assert m.grid_points in (48, 49), (name, m.grid_points)
    assert 0 < m.resolution <= 1.0
    assert m.num_channels >= 2


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    # one per family
    "dense", "default2017", "crossdock_default2018",
    "general_default2018", "redock_default2018",
    "all_default_to_default_1_3_1", "dense_1_3_PT_KD_def2018",
])
def test_forward_parity_vs_torch(name):
    torch = pytest.importorskip("torch")

    from gnina_tpu.models.registry import MODEL_NAMES as MN
    from gnina_tpu.models.runtime import execute

    m = load_model(name)
    pt = f"/root/reference/gninasrc/lib/models/{MN[name]}.pt"
    import os

    if not os.path.exists(pt):
        pytest.skip("reference models not mounted")
    mod = torch.jit.load(pt, map_location="cpu")
    mod.eval()
    rng = np.random.RandomState(0)
    x = rng.rand(1, m.num_channels, m.grid_points, m.grid_points,
                 m.grid_points).astype(np.float32) * 0.3
    with torch.no_grad():
        tout = mod(torch.from_numpy(x))
    pose_t = tout[0].numpy()
    aff_t = tout[1].numpy()
    pose_j, aff_j = execute(m.spec, m.params, x)
    # unnormalized logits can be large; bound the relative error
    np.testing.assert_allclose(np.asarray(pose_j), pose_t, atol=1e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aff_j).reshape(aff_t.shape),
                               aff_t, atol=1e-3, rtol=1e-4)
