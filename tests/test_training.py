"""Training runtime tests: train step, eval AUC, sharded-vs-single parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anomaly_detection_on_video_tpu.data.features import FeatureDataset
from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.parallel import local_mesh, shard_batch
from anomaly_detection_on_video_tpu.training import (
    TrainState,
    VideoAnomalyDetectionRunner,
)
from anomaly_detection_on_video_tpu.training.runner import (
    evaluate,
    make_train_step,
)

TINY = dict(dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24)
FDIM = 25  # channels + magnitude


def tiny_state(seed=0, randomize=False, **overrides):
    config, model = build_model("mgfn", **{**TINY, **overrides})
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 8, FDIM)),
        train=True,
    )
    if randomize:
        # at default init the head LayerNorm (scale=1, bias=0) makes every
        # clip's feature magnitude exactly sqrt(dim): top-k selection becomes
        # fp-noise tie-breaking. Randomized params separate the magnitudes so
        # selection is stable, as it is for a trained model.
        leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
        keys = jax.random.split(jax.random.PRNGKey(seed + 100), len(leaves))
        leaves = [
            l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ]
        variables = dict(variables, params=jax.tree_util.tree_unflatten(treedef, leaves))
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    return model, TrainState.create(model, variables, adam_with_l2())


def make_batch(rng, bsz=4, t=8):
    return (
        jnp.asarray(rng.randn(2 * bsz, 10, t, FDIM).astype(np.float32)),
        jnp.zeros(bsz),
        jnp.ones(bsz),
    )


def test_two_stream_features_train_end_to_end(rng, tmp_path):
    """data.stream=both: paired RGB+flow features (12+12 -> TINY's 24
    channels) flow through build_feature_dataset -> train_batches -> the
    jit'd train step, i.e. two-stream fusion training works end to end."""
    from anomaly_detection_on_video_tpu.data import (
        build_feature_dataset,
        train_batches,
    )

    d = tmp_path / "train"
    d.mkdir()
    for name in ["Normal_1", "Normal_2", "Abuse_1", "Abuse_2"]:
        np.save(d / f"{name}_i3d.npy", rng.randn(10, 8, 12).astype(np.float32))
        np.save(d / f"{name}_flow.npy", rng.randn(10, 8, 12).astype(np.float32))
    ds = build_feature_dataset("train", local_path=str(d), stream="both")
    batch = next(train_batches(ds["normal"], ds["abnormal"], batch_size=2))
    assert batch["feature"].shape == (4, 10, 8, FDIM)

    model, state = tiny_state()
    step = make_train_step()
    state, loss = step(
        state,
        jnp.asarray(batch["feature"]),
        jnp.asarray(batch["normal_labels"]),
        jnp.asarray(batch["abnormal_labels"]),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))


def test_train_step_decreases_loss_on_fixed_batch(rng):
    model, state = tiny_state()
    feature, nlab, alab = make_batch(rng)
    step = make_train_step()
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, loss = step(state, feature, nlab, alab, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sharded_train_step_matches_single_device(rng):
    """DP over the 8-device CPU mesh must be numerically equivalent to
    single-device execution (SURVEY.md §4 distributed test)."""
    feature, nlab, alab = make_batch(rng, bsz=8)
    key = jax.random.PRNGKey(3)

    # dropout_rate=0 + randomized params keep top-k selection deterministic
    # (exact-zero dropout ties / equal-magnitude LN ties would otherwise flip
    # under different reduction orders — amplification noise, not a DP bug)
    model, state1 = tiny_state(dropout_rate=0.0, randomize=True)
    single = make_train_step()
    state1, loss1 = single(state1, feature, nlab, alab, key)

    mesh = local_mesh()
    assert mesh.devices.size == 8
    model, state2 = tiny_state(dropout_rate=0.0, randomize=True)
    sharded = make_train_step(mesh)
    sb = shard_batch(mesh, {"f": feature, "n": nlab, "a": alab})
    state2, loss2 = sharded(state2, sb["f"], sb["n"], sb["a"], key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def make_eval_dataset(rng, n_videos=3):
    filenames, arrays, labels = [], {}, {}
    for i in range(n_videos):
        name = f"{'Normal' if i % 2 else 'Abuse'}_{i}_i3d.npy"
        n_clips = 4 + i
        arrays[name] = rng.randn(n_clips, 10, FDIM - 1).astype(np.float32)
        labels[name] = [float((i + j) % 2) for j in range(n_clips * 16)]
        filenames.append(name)
    return FeatureDataset(filenames=filenames, _arrays=arrays, labels=labels)


def test_evaluate_produces_auc(rng):
    model, state = tiny_state()
    ds = make_eval_dataset(rng)
    result = evaluate(state, ds)
    assert 0.0 <= result.rec_auc <= 1.0
    assert 0.0 <= result.pr_auc <= 1.0
    assert result.preds.shape == result.labels.shape


def test_runner_fit_end_to_end(rng, tmp_path):
    """Two epochs over tiny synthetic bags + eval, via the runner API."""
    config, model = build_model("mgfn", **TINY)
    normal = FeatureDataset(
        filenames=[f"Normal_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"Normal_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(4)
        },
    )
    abnormal = FeatureDataset(
        filenames=[f"Abuse_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"Abuse_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(4)
        },
    )

    class Capture:
        records = []

        def log(self, metrics, step):
            self.records.append((step, metrics))

    cap = Capture()
    runner = VideoAnomalyDetectionRunner(model, loggers=[cap])
    result = runner.fit(
        {"normal": normal, "abnormal": abnormal},
        valid_dataset=make_eval_dataset(rng),
        max_epochs=2,
        batch_size=2,
    )
    assert result is not None and 0.0 <= result.rec_auc <= 1.0
    keys = {k for _, m in cap.records for k in m}
    assert {"train_loss", "valid/rec_auc", "valid/pr_auc"} <= keys


def test_fit_max_steps_log_cadence_and_grad_clip(rng, tmp_path):
    """The reference trainer's remaining Lightning knobs
    (configs/trainer/default.yaml:4-7): max_steps caps optimizer steps
    mid-epoch and the stop boundary still evals + checkpoints;
    log_every_n_steps thins the per-step metric stream; gradient_clip_val
    clips raw gradients by global norm before the L2 term."""
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )

    config, model = build_model("mgfn", **TINY)
    mk = lambda kind: FeatureDataset(
        filenames=[f"{kind}_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"{kind}_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(
                np.float32
            )
            for i in range(4)
        },
    )

    class Capture:
        def __init__(self):
            self.records = []

        def log(self, metrics, step):
            self.records.append((step, metrics))

    cap = Capture()
    ckpt = TopKCheckpointer(str(tmp_path))
    runner = VideoAnomalyDetectionRunner(
        model, loggers=[cap], checkpointer=ckpt, grad_clip=1.0
    )
    result = runner.fit(
        {"normal": mk("Normal"), "abnormal": mk("Abuse")},
        valid_dataset=make_eval_dataset(rng),
        max_epochs=50,  # would be 100 steps; max_steps must cut it short
        batch_size=2,
        max_steps=3,
        log_every_n_steps=2,
    )
    ckpt.wait()
    assert int(runner.state.step) == 3  # 2 steps/epoch: stopped mid-epoch 2
    # the stop boundary evaluated and checkpointed with the metric
    assert result is not None and 0.0 <= result.rec_auc <= 1.0
    assert ckpt.resolve_step("latest") == 3
    assert ckpt.manager.metrics(3) is not None
    # log_every_n_steps=2: per-step metrics only on steps 1 and 3 (1-based
    # cadence, logged with the pre-increment step index)
    loss_steps = [s for s, m in cap.records if "train_loss" in m]
    assert loss_steps == [1]  # step index 1 == the 2nd step; the 3rd step
    # (index 2) stops the run before its (2k)th-step boundary


def test_checkpoint_every_n_epochs_cadence(rng, tmp_path):
    """checkpoint_every_n_epochs (the reference ModelCheckpoint callback's
    every_n_epochs, model_checkpoint.yaml) thins epoch-end saves; the
    final epoch always saves so a finished run never ends checkpoint-less
    between cadence boundaries."""
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )

    config, model = build_model("mgfn", **TINY)
    mk = lambda kind: FeatureDataset(
        filenames=[f"{kind}_{i}_i3d.npy" for i in range(2)],
        _arrays={
            f"{kind}_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(
                np.float32
            )
            for i in range(2)
        },
    )
    ckpt = TopKCheckpointer(str(tmp_path))
    runner = VideoAnomalyDetectionRunner(model, checkpointer=ckpt)
    runner.fit(
        {"normal": mk("Normal"), "abnormal": mk("Abuse")},
        # eval every epoch so each saving epoch carries a metric (top-k
        # preservation; metric-less saves only survive while latest)
        valid_dataset=make_eval_dataset(rng),
        max_epochs=5,  # 1 step/epoch -> steps 1..5
        batch_size=2,
        checkpoint_every_n_epochs=2,
    )
    ckpt.wait()
    # epochs 1 and 3 hit the every-2nd-epoch boundary (steps 2, 4); the
    # final epoch 4 (step 5) always saves
    assert sorted(ckpt.manager.all_steps()) == [2, 4, 5]


def test_grad_clip_bounds_the_update():
    """adam_with_l2(grad_clip=...) clips BEFORE the Adam moments: a huge
    raw gradient clipped far below Adam's eps produces a near-zero first
    update (lr * g / (sqrt(g^2) + eps) ~ lr * g / eps), while unclipped
    Adam saturates at ~learning_rate per element."""
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 1e6)}

    tx = adam_with_l2(learning_rate=1e-3, weight_decay=0.0, grad_clip=1e-12)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(updates["w"]).max()) < 1e-6

    tx_unclipped = adam_with_l2(learning_rate=1e-3, weight_decay=0.0)
    updates, _ = tx_unclipped.update(
        grads, tx_unclipped.init(params), params
    )
    assert float(jnp.abs(updates["w"]).max()) > 5e-4


def test_batched_eval_matches_single(rng):
    """Bucket-batched eval (batch_videos>1) must produce identical AUC to the
    per-video loop — masking keeps batching exact."""
    model, state = tiny_state(randomize=True)
    ds = make_eval_dataset(rng, n_videos=5)
    single = evaluate(state, ds, batch_videos=1)
    batched = evaluate(state, ds, batch_videos=3)
    np.testing.assert_allclose(batched.preds, single.preds, atol=1e-5)
    np.testing.assert_allclose(batched.rec_auc, single.rec_auc, atol=1e-6)


def test_eval_prefetched_assembly_matches_serial(rng):
    """Prefetching the eval group assembly (worker thread, depth 2) must be
    bit-identical to serial assembly — it only reorders WHEN host batches
    are built, never what they contain or their dispatch order."""
    model, state = tiny_state(randomize=True)
    ds = make_eval_dataset(rng, n_videos=7)
    for batch_videos, pad_groups in ((1, False), (3, True)):
        serial = evaluate(
            state, ds, batch_videos=batch_videos, pad_groups=pad_groups,
            prefetch_assembly=False,
        )
        pipelined = evaluate(
            state, ds, batch_videos=batch_videos, pad_groups=pad_groups,
            prefetch_assembly=True,
        )
        np.testing.assert_array_equal(pipelined.preds, serial.preds)
        assert pipelined.rec_auc == serial.rec_auc


def test_eval_result_figure(rng, tmp_path):
    model, state = tiny_state()
    result = evaluate(state, make_eval_dataset(rng))
    path = str(tmp_path / "fig" / "eval.png")
    result.save_figure(path)
    import os

    assert os.path.getsize(path) > 1000


def test_mesh_sharded_eval_matches_single(rng):
    """Eval over the 8-device CPU mesh (batch axis sharded, groups padded to
    a mesh multiple) must equal the single-device per-video loop."""
    from anomaly_detection_on_video_tpu.training.runner import make_eval_step

    model, state = tiny_state(randomize=True)
    ds = make_eval_dataset(rng, n_videos=5)
    single = evaluate(state, ds, batch_videos=1)
    mesh = local_mesh()
    sharded = evaluate(
        state, ds, eval_step=make_eval_step(mesh),
        batch_videos=mesh.devices.size, pad_groups=True,
    )
    np.testing.assert_allclose(sharded.preds, single.preds, atol=2e-5)
    np.testing.assert_allclose(sharded.rec_auc, single.rec_auc, atol=1e-6)


def test_runner_uses_mesh_for_eval_and_logs_lr(rng):
    """The runner must wire its mesh into the eval step (VERDICT r1 weak #4)
    and log the constant LR under the reference LRMonitor's metric name."""
    mesh = local_mesh()
    config, model = build_model("mgfn", **TINY)

    class Capture:
        def __init__(self):
            self.records = []

        def log(self, metrics, step):
            self.records.append((step, metrics))

    cap = Capture()
    runner = VideoAnomalyDetectionRunner(
        model, mesh=mesh, loggers=[cap], eval_batch_videos=3,
        optimizer_cfg={"learning_rate": 2e-3},
    )
    # eval_batch_videos rounds up to a multiple of the mesh size
    assert runner.eval_batch_videos == 8
    normal = FeatureDataset(
        filenames=[f"Normal_{i}_i3d.npy" for i in range(8)],
        _arrays={
            f"Normal_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(8)
        },
    )
    abnormal = FeatureDataset(
        filenames=[f"Abuse_{i}_i3d.npy" for i in range(8)],
        _arrays={
            f"Abuse_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(8)
        },
    )
    result = runner.fit(
        {"normal": normal, "abnormal": abnormal},
        valid_dataset=make_eval_dataset(rng, n_videos=5),
        max_epochs=1,
        batch_size=8,
    )
    assert result is not None and 0.0 <= result.rec_auc <= 1.0
    lr_values = [m["lr-Adam"] for _, m in cap.records if "lr-Adam" in m]
    assert lr_values and all(v == 2e-3 for v in lr_values)


def test_print_model_size(capsys):
    from anomaly_detection_on_video_tpu.utils import (
        model_size_bits,
        print_model_size,
    )

    model, state = tiny_state()
    n_params, bits = model_size_bits(state.variables)
    assert n_params > 0 and bits == 32 * n_params  # f32 params
    line = print_model_size(state.variables)
    assert line == f"model size: {bits} / bit | {bits / 8e6:.2f} / MB"
    assert line in capsys.readouterr().out


def test_dp_tp_train_step_matches_single_device(rng):
    """DP x TP over a (4 data, 2 model) mesh must match single-device
    execution: params/moments shard tensor-parallel
    (parallel.tensor_parallel_specs), GSPMD inserts the collectives."""
    from anomaly_detection_on_video_tpu.parallel import (
        make_mesh,
        tensor_parallel_specs,
    )

    feature, nlab, alab = make_batch(rng, bsz=8)
    key = jax.random.PRNGKey(5)

    model, state1 = tiny_state(dropout_rate=0.0, randomize=True)
    single = make_train_step()
    state1, loss1 = single(state1, feature, nlab, alab, key)

    mesh = make_mesh((4, 2), ("data", "model"))
    model, state2 = tiny_state(dropout_rate=0.0, randomize=True)
    specs = tensor_parallel_specs(state2, mesh)
    # at least one weight must actually split over the model axis
    assert any(
        "model" in (s.spec or ()) for s in jax.tree_util.tree_leaves(specs)
        if hasattr(s, "spec")
    )
    state2 = jax.tree_util.tree_map(jax.device_put, state2, specs)
    sharded = make_train_step(mesh, state=state2)
    sb = shard_batch(mesh, {"f": feature, "n": nlab, "a": alab})
    state2, loss2 = sharded(state2, sb["f"], sb["n"], sb["a"], key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_runner_fit_with_tp_mesh(rng):
    """The runner must train on a (data, model) mesh end-to-end (DP x TP)."""
    from anomaly_detection_on_video_tpu.parallel import make_mesh

    config, model = build_model("mgfn", **TINY)
    normal = FeatureDataset(
        filenames=[f"Normal_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"Normal_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(4)
        },
    )
    abnormal = FeatureDataset(
        filenames=[f"Abuse_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"Abuse_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
            for i in range(4)
        },
    )
    mesh = make_mesh((4, 2), ("data", "model"))
    runner = VideoAnomalyDetectionRunner(model, mesh=mesh)
    result = runner.fit(
        {"normal": normal, "abnormal": abnormal},
        valid_dataset=make_eval_dataset(rng, n_videos=4),
        max_epochs=1,
        batch_size=4,
    )
    assert result is not None and 0.0 <= result.rec_auc <= 1.0


def test_infer_score_features_bucket_boundaries(rng):
    """infer.score_features must handle clip counts at and across bucket
    boundaries (32 -> 32, 33 -> 64) with masked padding."""
    import os as _os
    import sys as _sys

    _sys.path.insert(
        0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    from infer import score_features
    from anomaly_detection_on_video_tpu.training.runner import make_eval_step

    model, state = tiny_state(randomize=True)
    eval_step = make_eval_step()
    for n_clips in (3, 32, 33):
        feats = rng.randn(n_clips, 10, FDIM - 1).astype(np.float32)
        scores = score_features(feats, state.apply_fn, state.variables, eval_step)
        assert scores.shape == (n_clips,)
        assert np.isfinite(scores).all()
        assert (scores >= 0).all() and (scores <= 1).all()


def test_eval_report_breakdown(rng):
    """EvalResult.report: FAR over normal videos, abnormal-subset AUC, and
    per-class AUC (class videos + all normal videos) must equal the same
    metrics computed directly on the per-video slices."""
    from anomaly_detection_on_video_tpu.ops.metrics import (
        false_alarm_rate,
        roc_auc,
    )

    filenames, arrays, labels = [], {}, {}
    # two anomaly classes + two normal videos, mixed frame labels
    for name, n_clips in [
        ("Abuse001_x264_i3d.npy", 4),
        ("Abuse002_x264_i3d.npy", 5),
        ("Shooting001_x264_i3d.npy", 6),
        ("Normal_Videos_001_x264_i3d.npy", 4),
        ("Normal_Videos_002_x264_i3d.npy", 7),
    ]:
        arrays[name] = rng.randn(n_clips, 10, FDIM - 1).astype(np.float32)
        if "Normal" in name:
            labels[name] = [0.0] * (n_clips * 16)
        else:
            labels[name] = [float(j % 2) for j in range(n_clips * 16)]
        filenames.append(name)
    ds = FeatureDataset(filenames=filenames, _arrays=arrays, labels=labels)

    model, state = tiny_state(randomize=True)
    result = evaluate(state, ds)
    assert set(result.videos) == set(filenames)
    report = result.report()

    def frames(names):
        scores = np.concatenate([result.videos[n][0] for n in names])
        labs = np.concatenate(
            [np.asarray(result.videos[n][1]) for n in names]
        )
        return labs, scores

    normals = [n for n in filenames if "Normal" in n]
    abnormals = [n for n in filenames if "Normal" not in n]

    assert report["rec_auc"] == result.rec_auc
    assert report["normal_videos"] == 2
    assert report["abnormal_videos"] == 3
    assert report["far"] == false_alarm_rate(*frames(normals))
    assert report["far"] == result.false_alarm_rate()
    assert report["abnormal_auc"] == roc_auc(*frames(abnormals))
    assert set(report["per_class"]) == {"Abuse", "Shooting"}
    for cls, members in [
        ("Abuse", filenames[:2]), ("Shooting", filenames[2:3])
    ]:
        expect = roc_auc(*frames(members + normals))
        assert report["per_class"][cls]["auc"] == expect
        assert report["per_class"][cls]["videos"] == len(members)
    assert report["per_class"]["Shooting"]["frames"] == 6 * 16


def test_eval_report_no_normals_and_single_class_slices(rng):
    """Degenerate report inputs: no normal videos -> NaN FAR; an all-one
    label slice -> auc None (ROC undefined), not a crash."""
    filenames, arrays, labels = [], {}, {}
    for name, n_clips, lab in [
        ("Abuse001_x264_i3d.npy", 4, 1.0),
        ("Fighting001_x264_i3d.npy", 4, None),
    ]:
        arrays[name] = rng.randn(n_clips, 10, FDIM - 1).astype(np.float32)
        if lab is None:
            labels[name] = [float(j % 2) for j in range(n_clips * 16)]
        else:
            labels[name] = [lab] * (n_clips * 16)
        filenames.append(name)
    ds = FeatureDataset(filenames=filenames, _arrays=arrays, labels=labels)
    model, state = tiny_state(randomize=True)
    report = evaluate(state, ds).report()
    assert np.isnan(report["far"])
    assert report["normal_videos"] == 0
    assert report["per_class"]["Abuse"]["auc"] is None  # labels all 1
    assert report["per_class"]["Fighting"]["auc"] is not None

def test_bf16_mixed_train_step_matches_f32(rng):
    """precision="bf16-mixed" (the TPU-native counterpart of the reference
    trainer's `precision: 32-true` knob): the forward/backward runs in
    bfloat16 but every master leaf — params, optimizer moments, batch stats
    — must keep its float32 dtype, the returned loss must be f32 and track
    the 32-true loss on the same batch, and repeated steps must converge."""
    feature, nlab, alab = make_batch(rng)
    key = jax.random.PRNGKey(0)

    # dropout 0 + randomized params: deterministic top-k (see the DP test)
    model, state32 = tiny_state(dropout_rate=0.0, randomize=True)
    _, state16 = tiny_state(dropout_rate=0.0, randomize=True)
    step32 = make_train_step()
    step16 = make_train_step(precision="bf16-mixed")

    new32, loss32 = step32(state32, feature, nlab, alab, key)
    new16, loss16 = step16(state16, feature, nlab, alab, key)
    assert loss16.dtype == jnp.float32
    assert np.isfinite(float(loss16))
    # bf16 rounds the forward, not the semantics: one step's loss agrees to
    # well inside bf16's ~0.4% relative error amplified through a tiny net
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.05, atol=0.05)
    # the mixed step must not leak bf16 into the checkpointed state layout
    for l32, l16 in zip(
        jax.tree_util.tree_leaves(new32), jax.tree_util.tree_leaves(new16)
    ):
        assert l16.dtype == l32.dtype

    losses = [float(loss16)]
    state = new16  # state16 was donated to the first step
    for i in range(29):
        state, loss = step16(
            state, feature, nlab, alab, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_precision_knob_validation_and_runner_wiring(rng):
    """Unknown precision strings fail fast (fp16 has no TPU MXU path), and
    the runner passes the knob through to its jit'd step."""
    with pytest.raises(ValueError, match="bf16-mixed"):
        make_train_step(precision="16-mixed")

    config, model = build_model("mgfn", **TINY)
    with pytest.raises(ValueError, match="precision"):
        VideoAnomalyDetectionRunner(model, precision="64-true")

    datasets = {}
    for split, prefix in [("normal", "Normal"), ("abnormal", "Abuse")]:
        names = [f"{prefix}_{i}_i3d.npy" for i in range(2)]
        datasets[split] = FeatureDataset(
            filenames=names,
            _arrays={
                n: rng.randn(10, 8, FDIM - 1).astype(np.float32) for n in names
            },
        )
    runner = VideoAnomalyDetectionRunner(model, precision="bf16-mixed")
    result = runner.fit(
        datasets, valid_dataset=make_eval_dataset(rng),
        max_epochs=1, batch_size=2,
    )
    assert result is not None and 0.0 <= result.rec_auc <= 1.0
    assert all(
        l.dtype != jnp.bfloat16
        for l in jax.tree_util.tree_leaves(runner.state.params)
    )


def test_resume_continues_epoch_count(rng, tmp_path):
    """A resumed run trains only the REMAINING epochs (derived from the
    restored step), not max_epochs more; a resume whose epoch budget is
    already spent trains nothing but still reports a final eval."""
    from anomaly_detection_on_video_tpu.data.features import train_batches
    from anomaly_detection_on_video_tpu.training.checkpoints import (
        TopKCheckpointer,
    )

    mk = lambda kind: FeatureDataset(
        filenames=[f"{kind}_{i}_i3d.npy" for i in range(4)],
        _arrays={
            f"{kind}_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(
                np.float32
            )
            for i in range(4)
        },
    )
    datasets = {"normal": mk("Normal"), "abnormal": mk("Abuse")}
    valid = make_eval_dataset(rng)

    config, model = build_model("mgfn", **TINY)
    ckpt = TopKCheckpointer(str(tmp_path))
    runner = VideoAnomalyDetectionRunner(model, checkpointer=ckpt)
    runner.fit(datasets, valid_dataset=valid, max_epochs=2, batch_size=2)
    ckpt.wait()
    assert int(runner.state.step) == 4  # 2 steps/epoch x 2 epochs

    def resumed_runner():
        _, fresh = build_model("mgfn", **TINY)
        r = VideoAnomalyDetectionRunner(fresh, checkpointer=ckpt)
        example = next(
            train_batches(
                datasets["normal"], datasets["abnormal"], batch_size=2
            )
        )
        r.init_state(example["feature"])
        r.restore(ckpt.restore_latest(r.state))
        return r

    # one REMAINING epoch (epochs 0-1 already done), not 3 more
    r = resumed_runner()
    assert int(r.state.step) == 4
    result = r.fit(datasets, valid_dataset=valid, max_epochs=3, batch_size=2)
    assert int(r.state.step) == 6
    assert result is not None

    # budget already spent: nothing trains, but the restored model still
    # gets a final eval instead of a silent exit
    ckpt.wait()
    r = resumed_runner()
    assert int(r.state.step) == 6
    result = r.fit(datasets, valid_dataset=valid, max_epochs=3, batch_size=2)
    assert int(r.state.step) == 6  # no additional steps
    assert result is not None and 0.0 <= result.rec_auc <= 1.0


def test_grad_accumulation_matches_mean_of_grads(rng):
    """Lightning's accumulate_grad_batches semantics: the microbatched step
    over k stacked loader batches must equal averaging the k independent
    per-batch gradients and applying Adam ONCE (batch stats thread
    sequentially; in train mode BN normalizes with batch statistics, so
    the running stats do not feed back into the microbatch losses)."""
    import optax

    model, state = tiny_state(dropout_rate=0.0, randomize=True)
    x1, nlab, alab = make_batch(rng)
    x2, _, _ = make_batch(rng)
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    def loss_fn(params, stats, x, key):
        out, updates = state.apply_fn(
            {"params": params, "batch_stats": stats},
            x,
            abnormal_labels=alab,
            normal_labels=nlab,
            train=True,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return out.loss, updates["batch_stats"]

    # oracle first (the jitted step donates `state`)
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    (l1, s1), g1 = vg(state.params, state.batch_stats, x1, keys[0])
    (l2, s2), g2 = vg(state.params, s1, x2, keys[1])
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)
    updates, _ = state.tx.update(grads, state.opt_state, state.params)
    want_params = jax.device_get(optax.apply_updates(state.params, updates))
    want_loss = float((l1 + l2) / 2)
    want_stats = jax.device_get(s2)

    micro_step = make_train_step(microbatched=True)
    new_state, loss = micro_step(
        state,
        jnp.stack([x1, x2]),
        jnp.stack([nlab, nlab]),
        jnp.stack([alab, alab]),
        keys,
    )
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-6)
    # 2e-5 as in test_sharded_train_step_matches_single_device: the scan
    # sums grads in a different order than the tree-map average (f32)
    for a, b in zip(
        jax.tree_util.tree_leaves(want_params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_allclose(np.asarray(b), a, atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(want_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)
    assert int(new_state.step) == 1  # one optimizer step for k batches


def test_runner_fit_with_grad_accumulation(rng):
    """accumulate_grad_batches through the runner: step counts optimizer
    steps (Lightning global_step), a short trailing group still trains,
    and resume epoch math uses the rounded-up epoch length."""

    def dataset(prefix, n):
        return FeatureDataset(
            filenames=[f"{prefix}_{i}_i3d.npy" for i in range(n)],
            _arrays={
                f"{prefix}_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(
                    np.float32
                )
                for i in range(n)
            },
        )

    class Capture:
        def __init__(self):
            self.records = []

        def log(self, metrics, step):
            self.records.append((step, metrics))

    config, model = build_model("mgfn", **TINY)
    cap = Capture()
    runner = VideoAnomalyDetectionRunner(
        model, loggers=[cap], accumulate_grad_batches=2
    )
    # 3 loader batches per epoch -> groups of 2 then 1 -> 2 optimizer steps
    runner.fit(
        {"normal": dataset("Normal", 3), "abnormal": dataset("Abuse", 3)},
        valid_dataset=make_eval_dataset(rng),
        max_epochs=2,
        batch_size=1,
    )
    assert int(runner.state.step) == 4  # 2 optimizer steps x 2 epochs
    train_steps = [s for s, m in cap.records if "train_loss" in m]
    assert max(train_steps) == 3

    with pytest.raises(ValueError, match="accumulate_grad_batches"):
        VideoAnomalyDetectionRunner(model, accumulate_grad_batches=0)


def test_grad_accumulation_sharded_matches_single(rng):
    """The microbatched step's (None, 'data') batch sharding: DP over the
    8-device mesh must match single-device accumulation."""
    x1, nlab, alab = make_batch(rng, bsz=8)
    x2, _, _ = make_batch(rng, bsz=8)
    feature = jnp.stack([x1, x2])
    nl, al = jnp.stack([nlab, nlab]), jnp.stack([alab, alab])
    keys = jax.random.split(jax.random.PRNGKey(5), 2)

    model, state1 = tiny_state(dropout_rate=0.0, randomize=True)
    state1, loss1 = make_train_step(microbatched=True)(
        state1, feature, nl, al, keys
    )

    mesh = local_mesh()
    model, state2 = tiny_state(dropout_rate=0.0, randomize=True)
    sharded = make_train_step(mesh, microbatched=True)
    state2, loss2 = sharded(state2, feature, nl, al, keys)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_prefetch_order_errors_and_abandon():
    """data/prefetch.py unit behavior: order-preserving, exception
    propagation, and clean worker shutdown when the consumer breaks
    (the preemption-stop path in runner.fit)."""
    import threading

    from anomaly_detection_on_video_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(50)), depth=2)) == list(range(50))
    assert list(prefetch([], depth=1)) == []
    with pytest.raises(ValueError, match="depth"):
        next(prefetch([1], depth=0))

    def boom():
        yield 1
        raise RuntimeError("loader died")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        next(it)

    before = threading.active_count()
    it = prefetch(iter(range(10_000)), depth=1)
    assert next(it) == 0
    it.close()  # abandoning must stop the worker thread
    deadline = 50
    while threading.active_count() > before and deadline:
        import time

        time.sleep(0.01)
        deadline -= 1
    assert threading.active_count() <= before


def test_prefetch_pipelined_equals_serial(rng):
    """num_workers>=1 (background double-buffer) must train bit-identically
    to num_workers=0 (synchronous): the prefetch thread only reorders
    host/device overlap, never batches."""
    config, model = build_model("mgfn", **TINY)

    def datasets():
        normal = FeatureDataset(
            filenames=[f"Normal_{i}_i3d.npy" for i in range(4)],
            _arrays={
                f"Normal_{i}_i3d.npy": rng2.randn(10, 8, FDIM - 1).astype(
                    np.float32
                )
                for i in range(4)
            },
        )
        abnormal = FeatureDataset(
            filenames=[f"Abuse_{i}_i3d.npy" for i in range(4)],
            _arrays={
                f"Abuse_{i}_i3d.npy": rng2.randn(10, 8, FDIM - 1).astype(
                    np.float32
                )
                for i in range(4)
            },
        )
        return {"normal": normal, "abnormal": abnormal}

    finals = []
    for workers in (0, 2):
        rng2 = np.random.RandomState(7)
        runner = VideoAnomalyDetectionRunner(
            model, data_cfg={"num_workers": workers}, seed=3
        )
        runner.fit(
            datasets(), valid_dataset=None, max_epochs=2, batch_size=2,
            shuffle=True,
        )
        finals.append(jax.tree_util.tree_leaves(runner.state.params))
    for a, b in zip(*finals):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_size_exceeding_dataset_is_clean_error(rng):
    """A batch_size larger than the smaller class used to spin max_epochs
    no-op epochs (nan losses, state never initialized) and crash in the
    final evaluate; it must raise a clean ValueError naming the sizes."""
    config, model = build_model("mgfn", **TINY)
    arrays = {
        f"{p}_{i}_i3d.npy": rng.randn(10, 8, FDIM - 1).astype(np.float32)
        for p in ("Normal", "Abuse")
        for i in range(2)
    }
    datasets = {
        "normal": FeatureDataset(
            filenames=[f"Normal_{i}_i3d.npy" for i in range(2)],
            _arrays=arrays,
        ),
        "abnormal": FeatureDataset(
            filenames=[f"Abuse_{i}_i3d.npy" for i in range(2)],
            _arrays=arrays,
        ),
    }
    runner = VideoAnomalyDetectionRunner(model, seed=0)
    with pytest.raises(ValueError, match="batch_size=4 exceeds"):
        runner.fit(datasets, valid_dataset=None, max_epochs=1, batch_size=4)
