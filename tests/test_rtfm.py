"""RTFM model family tests: registry, training dynamics, eval integration."""

import numpy as np
import jax
import jax.numpy as jnp

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.training import TrainState
from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
from anomaly_detection_on_video_tpu.training.runner import evaluate, make_train_step

from test_training import make_eval_dataset

TINY = dict(channels=24, hidden_dims=(16, 8), k=2, margin=5.0, dropout_rate=0.0)


def tiny_rtfm(seed=0):
    config, model = build_model("rtfm", **TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 8, 25)),  # 24 features + magnitude channel
        train=True,
    )
    return model, TrainState.create(model, variables, adam_with_l2())


def test_rtfm_registered():
    from anomaly_detection_on_video_tpu.models import MODEL_REGISTRY

    assert "rtfm" in MODEL_REGISTRY


def test_rtfm_forward_shapes(rng):
    model, state = tiny_rtfm()
    video = jnp.asarray(rng.randn(1, 10, 13, 25).astype(np.float32))
    out = model.apply(state.variables, video)
    assert out.scores.shape == (1, 13, 1)
    assert out.abnormal_scores.shape == (1, 1)


def test_rtfm_train_step_decreases_loss(rng):
    model, state = tiny_rtfm()
    feature = jnp.asarray(rng.randn(8, 10, 8, 25).astype(np.float32))
    nlab, alab = jnp.zeros(4), jnp.ones(4)
    step = make_train_step()
    losses = []
    for i in range(30):
        state, loss = step(state, feature, nlab, alab, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_rtfm_padded_eval_matches_unpadded(rng):
    model, state = tiny_rtfm()
    video = rng.randn(1, 10, 13, 25).astype(np.float32)
    ref = model.apply(state.variables, jnp.asarray(video))
    padded = np.concatenate(
        [video, np.zeros((1, 10, 3, 25), np.float32)], axis=2
    )
    out = model.apply(
        state.variables, jnp.asarray(padded), length=jnp.int32(13)
    )
    # masking is exact: zeros past the boundary reproduce SAME-conv padding,
    # padded keys are excluded from the linear attention, and the mean
    # normalization uses the true length
    np.testing.assert_allclose(
        np.asarray(out.scores)[:, :13], np.asarray(ref.scores), atol=1e-5
    )
    assert float(np.abs(np.asarray(out.scores)[:, 13:]).max()) == 0.0


def test_rtfm_evaluate_integration(rng):
    model, state = tiny_rtfm()
    result = evaluate(state, make_eval_dataset(rng), batch_videos=2)
    assert 0.0 <= result.rec_auc <= 1.0


# ---------------------------------------------------------------------------
# Official-layout interchange (VERDICT r2 #8): torch oracle in the official
# RTFM release naming <-> flax variables, parity-grade like MGFN's C13 role.
# ---------------------------------------------------------------------------


def _oracle_rtfm(channels=24, hidden=(16, 8), seed=0):
    import torch

    from torch_oracles import OracleRTFM

    torch.manual_seed(seed)
    oracle = OracleRTFM(channels=channels, hidden=hidden)
    oracle.eval()
    return oracle


def test_rtfm_converter_covers_all_params():
    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_rtfm_state_dict,
    )

    oracle = _oracle_rtfm()
    variables = convert_rtfm_state_dict(oracle.state_dict())
    n_torch = sum(v.numel() for v in oracle.state_dict().values())
    n_flax = sum(
        np.asarray(l).size for l in jax.tree_util.tree_leaves(variables)
    )
    assert n_torch == n_flax

    # converted tree loads into the model without shape surgery
    model, state = tiny_rtfm()
    ref = state.params
    flat_ref = jax.tree_util.tree_structure(ref)
    flat_new = jax.tree_util.tree_structure(variables["params"])
    assert flat_ref == flat_new


def test_rtfm_scores_match_oracle_f64(rng):
    """Converted official-layout weights must reproduce the oracle's
    inference scores at 1e-10 in f64 (same regime as the MGFN/I3D oracles)."""
    import torch

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_rtfm_state_dict,
    )

    oracle = _oracle_rtfm(seed=3)
    video = rng.randn(1, 10, 9, 24).astype(np.float64) * 1.5

    with torch.no_grad():
        golden = oracle.double()(torch.from_numpy(video)).numpy()
    oracle.float()

    variables = convert_rtfm_state_dict(oracle.state_dict())
    config, model = build_model("rtfm", **TINY)
    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), variables
        )
        # oracle consumes raw features; the model slices off the magnitude
        # channel itself, so feed it the same 24-d features directly
        out = model.apply(v64, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(out.scores), golden, atol=1e-10)


def test_rtfm_converter_folds_bn():
    """A BN right after a branch conv (the official non_local.W layout)
    folds exactly: scores match the torch forward with BN in eval mode."""
    import torch
    import torch.nn as nn

    from torch_oracles import OracleRTFM

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_rtfm_state_dict,
    )

    torch.manual_seed(5)
    oracle = OracleRTFM(channels=24, hidden=(16, 8))
    # rebuild W as the official Sequential(conv, BN) with non-trivial stats
    conv = oracle.Aggregate.non_local.W[0]
    bn = nn.BatchNorm1d(conv.out_channels)
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(conv.out_channels) * 0.1)
        bn.running_var.copy_(torch.rand(conv.out_channels) + 0.5)
        bn.weight.copy_(torch.rand(conv.out_channels) + 0.5)
        bn.bias.copy_(torch.randn(conv.out_channels) * 0.1)
    oracle.Aggregate.non_local.W = nn.Sequential(conv, bn)
    oracle.eval()

    rng2 = np.random.RandomState(0)
    video = rng2.randn(1, 10, 7, 24).astype(np.float64)
    with torch.no_grad():
        golden = oracle.double()(torch.from_numpy(video)).numpy()
    oracle.float()

    variables = convert_rtfm_state_dict(oracle.state_dict())
    config, model = build_model("rtfm", **TINY)
    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), variables
        )
        out = model.apply(v64, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(out.scores), golden, atol=1e-10)


def test_rtfm_export_round_trip():
    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_rtfm_state_dict,
        export_rtfm_state_dict,
    )

    oracle = _oracle_rtfm(seed=7)
    sd = {k: v for k, v in oracle.state_dict().items()}
    variables = convert_rtfm_state_dict(sd)
    back = export_rtfm_state_dict(variables)
    assert set(back) == set(sd)
    for key, val in sd.items():
        np.testing.assert_array_equal(back[key], val.numpy())


def test_rtfm_converter_rejects_bn_after_bias_free_conv4():
    """conv_4's flax counterpart ('proj') is bias-free (matching the
    official conv_4's bias=False): a BN folded there would produce a bias
    with nowhere to live, so the converter must raise rather than silently
    drop the shift (wrong scores)."""
    import pytest
    import torch
    import torch.nn as nn

    from torch_oracles import OracleRTFM

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_rtfm_state_dict,
    )

    torch.manual_seed(6)
    oracle = OracleRTFM(channels=24, hidden=(16, 8))
    conv = oracle.Aggregate.conv_4[0]
    bn = nn.BatchNorm1d(conv.out_channels)
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(conv.out_channels) * 0.1)
        bn.bias.copy_(torch.randn(conv.out_channels) * 0.1)
    oracle.Aggregate.conv_4 = nn.Sequential(conv, bn)
    oracle.eval()

    with pytest.raises(ValueError, match="conv_4.*bias-free"):
        convert_rtfm_state_dict(oracle.state_dict())

    # an identity-shift BN (folded bias exactly zero) still converts
    with torch.no_grad():
        bn.running_mean.zero_()
        bn.bias.zero_()
    variables = convert_rtfm_state_dict(oracle.state_dict())
    assert "bias" not in variables["params"]["aggregate"]["proj"]
