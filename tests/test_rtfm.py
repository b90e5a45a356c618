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
