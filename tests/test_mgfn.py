"""MGFN golden-parity tests: flax model + converter + losses vs torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from anomaly_detection_on_video_tpu.losses import (
    contrastive_loss,
    mgfn_loss,
    smoothness_loss,
    sparsity_loss,
)
from anomaly_detection_on_video_tpu.models.mgfn import (
    MGFNConfig,
    MGFNForVideoAnomalyDetection,
)
from anomaly_detection_on_video_tpu.utils.convert import convert_mgfn_state_dict

from torch_oracles import OracleMGFN, oracle_losses, randomize_bn_stats


def oracle_to_hf_state_dict(oracle):
    """Map the oracle's module names to the reference's HF-style names
    (backbone.amplifier.*, backbone.layers.{s}.{b}.*, layer_norm, fc)."""
    out = {}
    for key, val in oracle.state_dict().items():
        if key.startswith(("to_tokens", "to_mag")):
            out["backbone.amplifier." + key] = val
        elif key.startswith("layers."):
            out["backbone." + key] = val
        else:
            out[key] = val
    return out


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = OracleMGFN()
    # randomize conv/linear weights beyond default init for a sharper test
    randomize_bn_stats(model, seed=1)
    model.eval()
    return model


@pytest.fixture(scope="module")
def variables(oracle):
    return convert_mgfn_state_dict(oracle_to_hf_state_dict(oracle))


@pytest.fixture(scope="module")
def flax_model():
    return MGFNForVideoAnomalyDetection(MGFNConfig())


def test_converter_covers_all_params(oracle, variables):
    n_torch = sum(
        v.numel() for k, v in oracle.state_dict().items()
        if "num_batches_tracked" not in k
    )
    n_flax = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(variables))
    assert n_torch == n_flax


def test_inference_scores_match_oracle_f64(oracle, variables, flax_model):
    rng = np.random.RandomState(2)
    video = rng.randn(1, 10, 32, 2049).astype(np.float64) * 2.0

    with torch.no_grad():
        golden = oracle.double()(torch.from_numpy(video))
    oracle.float()
    g_ab, g_no, g_asel, g_nsel, g_scores = [t.numpy() for t in golden]

    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), variables)
        out = flax_model.apply(v64, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(out.scores), g_scores, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.abnormal_scores), g_ab, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.a_feat_magnitude), g_asel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.n_feat_magnitude), g_nsel, atol=1e-9)


def test_training_loss_matches_oracle_f64(oracle, variables, flax_model):
    """force_split path + full loss composition, eval-mode numerics
    (selection dropout off) in f64."""
    rng = np.random.RandomState(3)
    bs = 4  # 2 normal + 2 abnormal
    video = rng.randn(bs, 10, 16, 2049).astype(np.float64)
    nlabels = np.zeros(bs // 2, dtype=np.float64)
    alabels = np.ones(bs // 2, dtype=np.float64)

    with torch.no_grad():
        golden = oracle.double()(torch.from_numpy(video), force_split=True)
        g_loss = oracle_losses(
            *golden[:4],
            torch.from_numpy(alabels), torch.from_numpy(nlabels),
            golden[4], bs,
        ).item()
    oracle.float()

    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), variables)
        out = flax_model.apply(
            v64,
            jnp.asarray(video),
            abnormal_labels=jnp.asarray(alabels),
            normal_labels=jnp.asarray(nlabels),
            force_split=True,
        )
    assert out.loss is not None
    np.testing.assert_allclose(float(out.loss), g_loss, rtol=1e-10)


def test_train_mode_runs_with_dropout(variables, flax_model):
    rng = np.random.RandomState(4)
    video = rng.randn(4, 10, 16, 2049).astype(np.float32)
    out, updates = flax_model.apply(
        variables,
        jnp.asarray(video),
        abnormal_labels=jnp.ones(2),
        normal_labels=jnp.zeros(2),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(out.loss))
    # batch stats must actually update in train mode
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_loss_constants():
    x = jnp.asarray(np.random.RandomState(5).rand(2, 8, 1))
    golden = 8e-4 * float(jnp.sum((x[:, 1:] - x[:, :-1]) ** 2))
    np.testing.assert_allclose(float(smoothness_loss(x)), golden, rtol=1e-6)

    flat = jnp.asarray([3.0, 4.0])
    np.testing.assert_allclose(float(sparsity_loss(flat)), 8e-3 * 5.0, rtol=1e-6)

    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[1.0, 2.0]])
    # same pair, label 1: hinge at margin 200 -> (200 - ~0)^2
    val = float(contrastive_loss(a, b, 1.0))
    assert abs(val - (200.0 - np.sqrt(2) * 1e-6) ** 2) < 1e-3


def test_batchnorm_matches_torch_train_mode():
    from anomaly_detection_on_video_tpu.models.mgfn.model import TorchBatchNorm

    torch.manual_seed(0)
    tbn = torch.nn.BatchNorm1d(8)
    randomize_bn_stats(tbn, seed=2)
    x = np.random.RandomState(6).randn(4, 8, 12).astype(np.float32)

    bn = TorchBatchNorm(8)
    # .copy(): torch .numpy() views alias the live buffers, and the train-mode
    # tbn call below mutates running stats in place — jnp.asarray may
    # zero-copy the numpy view on CPU
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy().copy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy().copy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
            "var": jnp.asarray(tbn.running_var.numpy().copy()),
        },
    }

    # train mode: normalization uses batch stats; running stats update
    golden = tbn(torch.from_numpy(x)).detach().numpy()
    ours, updates = bn.apply(
        variables, jnp.asarray(x.transpose(0, 2, 1)), False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), golden, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-5
    )

    # eval mode uses (updated) running stats
    tbn.eval()
    golden_eval = tbn(torch.from_numpy(x)).detach().numpy()
    variables2 = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
    ours_eval = bn.apply(variables2, jnp.asarray(x.transpose(0, 2, 1)), True)
    np.testing.assert_allclose(
        np.asarray(ours_eval).transpose(0, 2, 1), golden_eval, atol=1e-5
    )


def test_padded_masked_eval_matches_unpadded(oracle, variables, flax_model):
    """Bucket padding + masking must be bit-equivalent to the unpadded run
    for the valid prefix (the whole point of the eval bucket design)."""
    rng = np.random.RandomState(7)
    t_valid = 23
    video = rng.randn(1, 10, t_valid, 2049).astype(np.float32)
    # default-init head LayerNorm makes every clip magnitude exactly
    # sqrt(dim) -> top-k selection is fp-tie chaos; perturb the LN scale so
    # magnitudes separate (as with trained weights) and selection is stable
    variables = jax.tree_util.tree_map(lambda a: a, variables)  # shallow copy
    variables["params"]["head_norm"]["scale"] = jnp.asarray(
        1.0 + 0.5 * rng.randn(1024).astype(np.float32)
    )
    out_ref = flax_model.apply(variables, jnp.asarray(video))

    padded = np.concatenate(
        [video, np.zeros((1, 10, 32 - t_valid, 2049), np.float32)], axis=2
    )
    out_pad = flax_model.apply(
        variables, jnp.asarray(padded), length=jnp.int32(t_valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_pad.scores)[:, :t_valid],
        np.asarray(out_ref.scores),
        atol=1e-6,
    )
    # top-k indices must come from the valid prefix only: scores agree
    np.testing.assert_allclose(
        np.asarray(out_pad.abnormal_scores),
        np.asarray(out_ref.abnormal_scores),
        atol=1e-6,
    )
