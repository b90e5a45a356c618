"""Sultani (CVPR 2018 MIL ranking) model family tests: registry, training
dynamics, eval integration, and parity-grade torch interchange — the same
tier as the MGFN/RTFM families."""

import numpy as np
import jax
import jax.numpy as jnp

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.training import TrainState
from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
from anomaly_detection_on_video_tpu.training.runner import evaluate, make_train_step

from test_training import make_eval_dataset

TINY = dict(channels=24, hidden_dims=(16, 8), dropout_rate=0.0)


def tiny_sultani(seed=0):
    config, model = build_model("sultani", **TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 8, 25)),  # 24 features + magnitude channel
        train=True,
    )
    return model, TrainState.create(model, variables, adam_with_l2())


def test_sultani_registered():
    from anomaly_detection_on_video_tpu.models import MODEL_REGISTRY

    assert "sultani" in MODEL_REGISTRY


def test_sultani_forward_shapes(rng):
    model, state = tiny_sultani()
    video = jnp.asarray(rng.randn(1, 10, 13, 25).astype(np.float32))
    out = model.apply(state.variables, video)
    assert out.scores.shape == (1, 13, 1)
    assert out.abnormal_scores.shape == (1, 1)
    assert float(np.min(np.asarray(out.scores))) >= 0.0
    assert float(np.max(np.asarray(out.scores))) <= 1.0


def test_sultani_train_step_decreases_loss(rng):
    model, state = tiny_sultani()
    feature = jnp.asarray(rng.randn(8, 10, 8, 25).astype(np.float32))
    # make the abnormal half separable so the ranking hinge has signal
    feature = feature.at[4:].add(
        jnp.asarray(rng.randn(1, 1, 1, 25).astype(np.float32))
    )
    nlab, alab = jnp.zeros(4), jnp.ones(4)
    step = make_train_step()
    losses = []
    for i in range(30):
        state, loss = step(state, feature, nlab, alab, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sultani_padded_eval_matches_unpadded(rng):
    model, state = tiny_sultani()
    video = rng.randn(1, 10, 13, 25).astype(np.float32)
    ref = model.apply(state.variables, jnp.asarray(video))
    padded = np.concatenate(
        [video, np.zeros((1, 10, 3, 25), np.float32)], axis=2
    )
    out = model.apply(
        state.variables, jnp.asarray(padded), length=jnp.int32(13)
    )
    # the scorer is per-segment (no temporal mixing), so masking is exact
    np.testing.assert_allclose(
        np.asarray(out.scores)[:, :13], np.asarray(ref.scores), atol=1e-7
    )
    assert float(np.abs(np.asarray(out.scores)[:, 13:]).max()) == 0.0


def test_sultani_evaluate_integration(rng):
    model, state = tiny_sultani()
    result = evaluate(state, make_eval_dataset(rng), batch_videos=2)
    assert 0.0 <= result.rec_auc <= 1.0


# ---------------------------------------------------------------------------
# Torch interchange (C13 role): pytorch-port layout <-> flax variables,
# parity-grade like the MGFN/RTFM converters.
# ---------------------------------------------------------------------------


def _oracle_sultani(channels=24, hidden=(16, 8), seed=0):
    import torch

    from torch_oracles import OracleSultani

    torch.manual_seed(seed)
    oracle = OracleSultani(channels=channels, hidden=hidden)
    oracle.eval()
    return oracle


def test_sultani_converter_covers_all_params():
    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_sultani_state_dict,
    )

    oracle = _oracle_sultani()
    variables = convert_sultani_state_dict(oracle.state_dict())
    n_torch = sum(v.numel() for v in oracle.state_dict().values())
    n_flax = sum(
        np.asarray(l).size for l in jax.tree_util.tree_leaves(variables)
    )
    assert n_torch == n_flax

    model, state = tiny_sultani()
    assert jax.tree_util.tree_structure(
        state.params
    ) == jax.tree_util.tree_structure(variables["params"])


def test_sultani_scores_match_oracle_f64(rng):
    """Converted weights must reproduce the oracle's inference scores at
    1e-10 in f64 (same regime as the MGFN/RTFM/I3D oracles)."""
    import torch

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_sultani_state_dict,
    )

    oracle = _oracle_sultani(seed=3)
    video = rng.randn(2, 10, 9, 24).astype(np.float64) * 1.5

    with torch.no_grad():
        golden = oracle.double()(torch.from_numpy(video)).numpy()
    oracle.float()

    variables = convert_sultani_state_dict(oracle.state_dict())
    config, model = build_model("sultani", **TINY)
    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), variables
        )
        out = model.apply(v64, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(out.scores), golden, atol=1e-10)


def test_sultani_loss_matches_oracle_f64(rng):
    """The MIL ranking objective (hinge on maxima + smoothness/sparsity on
    the abnormal bag) must match the torch oracle at 1e-10 in f64."""
    import torch

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_sultani_state_dict,
    )

    oracle = _oracle_sultani(seed=5)
    video = rng.randn(4, 10, 8, 24).astype(np.float64)

    with torch.no_grad():
        golden = float(oracle.double().ranking_loss(torch.from_numpy(video)))
    oracle.float()

    variables = convert_sultani_state_dict(oracle.state_dict())
    config, model = build_model("sultani", **TINY)
    with jax.enable_x64(True):
        v64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), variables
        )
        out = model.apply(
            v64,
            jnp.asarray(video),
            normal_labels=jnp.zeros(2, jnp.float64),
            abnormal_labels=jnp.ones(2, jnp.float64),
            force_split=True,
        )
    np.testing.assert_allclose(float(out.loss), golden, atol=1e-10)


def test_sultani_export_round_trip():
    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_sultani_state_dict,
        export_sultani_state_dict,
    )

    oracle = _oracle_sultani(seed=7)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = convert_sultani_state_dict(sd)
    back = export_sultani_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
