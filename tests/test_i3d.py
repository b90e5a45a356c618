"""I3D golden-parity tests: flax model + converter vs the torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from anomaly_detection_on_video_tpu.models.i3d import (
    build_i3d_feature_extractor,
    i3d_8x8_r50,
    i3res50,
)
from anomaly_detection_on_video_tpu.utils.convert import convert_i3res50_state_dict

from torch_oracles import TorchI3Res50, randomize_bn_stats


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchI3Res50()
    randomize_bn_stats(model)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted_variables(torch_model):
    return convert_i3res50_state_dict(torch_model.state_dict())


def test_convert_covers_all_torch_params(torch_model, converted_variables):
    n_torch = sum(p.numel() for p in torch_model.state_dict().values()
                  if p.dtype.is_floating_point)
    n_flax = sum(
        np.asarray(leaf).size
        for leaf in jax.tree_util.tree_leaves(converted_variables)
    )
    assert n_torch == n_flax


def test_i3res50_matches_torch_oracle_f64(torch_model, converted_variables):
    """Exact-architecture check: in float64 any topology/converter mistake
    shows up far above the 1e-10 tolerance; fp32 runs differ only by
    accumulation order (covered by the fp32 test below)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 64, 64, 3).astype(np.float64)

    with torch.no_grad():
        golden = torch_model.double()(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    golden = golden.numpy().squeeze(-1).squeeze(-1).squeeze(-1)  # (2, 2048)
    torch_model.float()

    with jax.enable_x64(True):
        variables = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), converted_variables
        )
        model = i3res50(dtype=jnp.float64)
        ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == golden.shape == (2, 2048)
    np.testing.assert_allclose(ours, golden, atol=1e-10, rtol=1e-10)


def test_i3res50_fp32_close_to_torch(torch_model, converted_variables):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        golden = torch_model(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    golden = golden.numpy().squeeze(-1).squeeze(-1).squeeze(-1)
    ours = np.asarray(i3res50().apply(converted_variables, jnp.asarray(x)))
    # fp32 accumulation-order differences only: tight in units of feature scale
    scale = np.abs(golden).mean()
    assert np.abs(ours - golden).max() < 5e-3 * max(scale, 1.0)


def test_i3res50_shapes_full_resolution(converted_variables):
    # the canonical extraction shape: (B, 16, 224, 224, 3) -> (B, 2048)
    model = i3res50()
    x = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
    out = model.apply(converted_variables, x)
    assert out.shape == (1, 2048)


def test_i3d_8x8_r50_shapes():
    model = i3d_8x8_r50()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((2, 16, 224, 224, 3)))
    assert out.shape == (2, 2048)


def test_build_factory_rejects_unknown():
    with pytest.raises(AttributeError):
        build_i3d_feature_extractor("nope")
