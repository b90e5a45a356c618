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
    (backbone.amplifier.*, backbone.layers.{s}.{b}.*, layer_norm, fc).

    Accepts a module (uses its state_dict) or a plain {name: tensor}
    mapping — the latter lets per-parameter GRADIENTS ride the same
    renaming + converter path (the converter is a pure re-layout —
    transpose/reshape/rename — so it maps gradients linearly)."""
    sd = oracle if isinstance(oracle, dict) else oracle.state_dict()
    out = {}
    for key, val in sd.items():
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


# ---------------------------------------------------------------------------
# Training-DYNAMICS parity: gradients and multi-step Adam trajectories vs
# torch autograd + torch.optim.Adam at the REFERENCE hyperparameters
# (lr=1e-3, weight_decay=5e-4 — configs/runner/default.yaml:5-7,
# src/runner.py:53-59; gradient_clip_val is null in the reference trainer).
# Loss-VALUE parity (above) does not cover the train step: these tests pin
# the backward graph (grad flow through lax.top_k vs torch.topk's gather,
# the BCE clamp, pairwise-distance eps) and the optimizer coupling
# (torch Adam's L2-into-gradient == add_decayed_weights before adam).
# Deterministic training numerics: BN in batch (train) mode both sides,
# selection dropout off (rate 0 — the one train-mode op whose randomness
# cannot be matched across frameworks).
# ---------------------------------------------------------------------------


# reduced-width config for the dynamics tests: full-width f64 runs cost
# ~40 min of CPU here while covering the same graph — every stage, both
# block types, the intermediates, BN, top-k selection, all losses, and
# the optimizer coupling are width-independent
_DYN = dict(dims=(32, 64, 128), depths=(2, 2, 2), channels=256, dim_head=16)


def _fresh_train_pair():
    """(torch oracle in train mode f64, flax model with dropout 0, f64
    variables-as-numpy). Cast to jnp only INSIDE jax.enable_x64 — outside
    it, jnp.asarray silently truncates to f32."""
    torch.manual_seed(10)
    oracle = OracleMGFN(types=("gb", "fb", "fb"), **_DYN)
    randomize_bn_stats(oracle, seed=11)
    oracle.double().train()
    variables = convert_mgfn_state_dict(oracle_to_hf_state_dict(oracle))
    model = MGFNForVideoAnomalyDetection(
        MGFNConfig(dropout_rate=0.0, **_DYN)
    )
    return oracle, model, variables


def _as_x64(variables):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), variables
    )


def _train_batch(seed, bs=4, t=16):
    rng = np.random.RandomState(seed)
    video = rng.randn(bs, 10, t, _DYN["channels"] + 1).astype(np.float64)
    nlabels = np.zeros(bs // 2, dtype=np.float64)
    alabels = np.ones(bs // 2, dtype=np.float64)
    return video, nlabels, alabels


def _torch_loss(oracle, video, nlabels, alabels):
    out = oracle(torch.from_numpy(video), force_split=True)
    return oracle_losses(
        *out[:4],
        torch.from_numpy(alabels), torch.from_numpy(nlabels),
        out[4], video.shape[0],
    )


def _torch_grads_as_flax(oracle):
    grads = {
        name: param.grad.detach().clone()
        for name, param in oracle.named_parameters()
    }
    return convert_mgfn_state_dict(oracle_to_hf_state_dict(grads))["params"]


def _assert_trees_close(ours, golden, rtol, atol, what):
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(golden)[0]
    assert len(flat_o) == len(flat_g)
    for (path, leaf_o), (_, leaf_g) in zip(flat_o, flat_g):
        np.testing.assert_allclose(
            np.asarray(leaf_o), np.asarray(leaf_g), rtol=rtol, atol=atol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


def test_gradients_match_torch_autograd_f64():
    """Per-leaf dL/dθ after one training-mode forward/backward matches
    torch autograd in f64 (train-mode BN numerics, dropout off)."""
    oracle, model, variables = _fresh_train_pair()
    video, nlabels, alabels = _train_batch(20)

    _torch_loss(oracle, video, nlabels, alabels).backward()
    golden = _torch_grads_as_flax(oracle)

    with jax.enable_x64(True):
        v64 = _as_x64(variables)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v64["batch_stats"]},
                jnp.asarray(video),
                abnormal_labels=jnp.asarray(alabels),
                normal_labels=jnp.asarray(nlabels),
                force_split=True,
                train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            return out.loss

        grads = jax.grad(loss_fn)(v64["params"])

    _assert_trees_close(grads, golden, rtol=1e-8, atol=1e-10, what="grad")


def test_adam_trajectory_matches_torch_f64():
    """N=12 optimizer steps at the reference hparams (Adam lr=1e-3,
    coupled L2 wd=5e-4, no grad clip): params AND BN running stats stay
    in lockstep with torch through the production train step
    (make_train_step's jit'd path, not a reimplementation)."""
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
    from anomaly_detection_on_video_tpu.training.runner import (
        TrainState,
        make_train_step,
    )

    oracle, model, variables = _fresh_train_pair()
    batches = [_train_batch(seed) for seed in (30, 31, 32)]
    n_steps = 12

    optimizer = torch.optim.Adam(
        oracle.parameters(), lr=1e-3, weight_decay=5e-4
    )
    torch_losses = []
    for i in range(n_steps):
        video, nlabels, alabels = batches[i % len(batches)]
        optimizer.zero_grad()
        loss = _torch_loss(oracle, video, nlabels, alabels)
        loss.backward()
        optimizer.step()
        torch_losses.append(float(loss.detach()))
    golden = convert_mgfn_state_dict(oracle_to_hf_state_dict(oracle))

    with jax.enable_x64(True):
        state = TrainState.create(
            model, _as_x64(variables), adam_with_l2(1e-3, 5e-4)
        )
        step_fn = make_train_step()
        jax_losses = []
        for i in range(n_steps):
            video, nlabels, alabels = batches[i % len(batches)]
            state, loss = step_fn(
                state,
                jnp.asarray(video),
                jnp.asarray(nlabels),
                jnp.asarray(alabels),
                jax.random.PRNGKey(i),
            )
            jax_losses.append(float(loss))

    # the production step reports its loss in f32 (runner.py loss_fn) —
    # compare at f32 resolution; params below are the f64 signal
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-5)
    _assert_trees_close(
        state.params, golden["params"], rtol=1e-6, atol=1e-9, what="param"
    )
    _assert_trees_close(
        state.batch_stats, golden["batch_stats"], rtol=1e-8, atol=1e-10,
        what="batch_stat",
    )
