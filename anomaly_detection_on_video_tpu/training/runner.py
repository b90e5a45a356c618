"""Training/eval runtime: one jit'd MIL train step + frame-level AUC eval.

Re-design of the reference's Lightning runner (reference: src/runner.py:18-140)
as explicit functional pieces:

- ``TrainState``            params + batch_stats + optimizer state pytree.
- ``make_train_step``       a single jit'd step: normal+abnormal bags already
  concatenated normal-first (the reference concatenates in training_step,
  src/runner.py:29-39), loss per models/mgfn, Adam-with-L2 update. Optionally
  sharded over a device mesh (batch axis = MIL bags, params replicated;
  gradients reduce over ICI automatically under jit).
- ``evaluate``              per-video scores -> frame-level ROC/PR AUC with
  x16 repeat (src/runner.py:42-50,62-79).
- ``VideoAnomalyDetectionRunner``  the epoch loop with checkpointing and
  metric logging — same responsibilities as the reference class, no
  Lightning.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data import eval_batches, train_batches
from ..data.prefetch import prefetch
from ..ops.metrics import frame_level_scores, pr_auc, roc_auc
from .optim import adam_with_l2


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, variables, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            tx=tx,
            apply_fn=model.apply,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


PRECISIONS = ("32-true", "bf16-mixed")


class DataConfigError(ValueError):
    """Pre-flight data/config validation failure (e.g. batch_size larger
    than the dataset) — the CLI maps THIS type to a clean one-line error;
    any other ValueError mid-training keeps its traceback."""


def _grouped(iterable, size: int):
    """Yield lists of up to ``size`` consecutive items (last may be short)."""
    group = []
    for item in iterable:
        group.append(item)
        if len(group) == size:
            yield group
            group = []
    if group:
        yield group


def make_train_step(
    mesh: Optional[jax.sharding.Mesh] = None,
    state: Optional["TrainState"] = None,
    precision: str = "32-true",
    microbatched: bool = False,
):
    """Build the jit'd train step.

    With a mesh, the batch is sharded over the ``data`` axis (MIL bags) and
    params are replicated; XLA inserts the psum for gradients (SURVEY.md
    §2.2 DP row). The normal/abnormal halves stay aligned because the bag
    axis is sharded contiguously and both halves are equal-sized.

    If the mesh also has a ``model`` axis and a ``state`` template is
    given, weights and optimizer moments additionally shard tensor-parallel
    over it (parallel/sharding.tensor_parallel_specs): GSPMD inserts the
    activation collectives, so DP x TP runs from the same step function.

    When the mesh spans multiple processes (a DCN multi-host run through
    ``jax.distributed``), the returned callable globalizes the host batch
    onto the mesh — every process feeds the same full batch (the data
    loader is deterministic given (seed, epoch), so identical inputs need
    no data exchange) and donates its addressable shards, exactly as
    ``make_eval_step`` does for scoring. The updated state stays a global
    array between steps, so the conversion cost is first-call-only; the
    replicated loss is readable on every host.

    ``precision`` is the trainer's numeric policy — the role of Lightning's
    ``precision: 32-true`` knob in the reference trainer config
    (configs/trainer/default.yaml:6). ``"32-true"`` (the reference default)
    runs everything in float32. ``"bf16-mixed"`` is the TPU-native mixed
    policy: the forward/backward casts params and the feature batch to
    bfloat16 (the MXU's native input dtype — halves HBM traffic, softmax
    still accumulates in f32, models/mgfn/model.py:156) while master
    params, gradients, optimizer moments, and batch statistics stay
    float32 — the gradient of the cast is a cast back, so ``grads`` below
    arrives in f32 automatically and the Adam update is full-precision.

    ``microbatched=True`` builds the gradient-accumulation form (the role
    of Lightning's ``accumulate_grad_batches`` Trainer knob, reachable in
    the reference through its ``_target_``-instantiated Trainer): every
    batch argument carries a leading micro-batch axis ``(k, ...)`` and
    ``rng`` is a stack of ``k`` dropout keys. The step ``lax.scan``s the
    forward/backward over the micro-batches — threading batch statistics
    sequentially, exactly as if the micro-batches were consecutive steps —
    averages the gradients, and applies the optimizer ONCE, so ``k`` here
    matches Lightning's semantics of ``k`` accumulated loader batches per
    optimizer step. ``k`` is read from the input shape, so a short trailing
    group at an epoch boundary accumulates over what it has (one extra
    compile for that shape). The TrainState layout is unchanged —
    checkpoints interchange freely across ``accumulate_grad_batches``
    settings.
    """
    if precision not in PRECISIONS:
        raise ValueError(
            f"precision must be one of {PRECISIONS}, got {precision!r}"
            " (TPUs have no fp16 MXU path: use bf16-mixed)"
        )
    half = precision == "bf16-mixed"

    def step(state: TrainState, feature, normal_labels, abnormal_labels, rng):
        def loss_fn(params, stats, x, n_labels, a_labels, dropout_rng):
            if half:
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16)
                    if p.dtype == jnp.float32 else p,
                    params,
                )
                x = x.astype(jnp.bfloat16)
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": stats},
                x,
                abnormal_labels=a_labels,
                normal_labels=n_labels,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            # running batch stats keep their master dtype (f32) so the
            # checkpointed/donated state layout is precision-independent
            new_stats = jax.tree_util.tree_map(
                lambda new, old: new.astype(old.dtype),
                updates["batch_stats"],
                stats,
            )
            return out.loss.astype(jnp.float32), new_stats

        if not microbatched:
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                state.params, state.batch_stats, feature,
                normal_labels, abnormal_labels, rng,
            )
        else:
            k = feature.shape[0]

            def micro(carry, xs):
                stats, grad_sum, loss_sum = carry
                x, n_labels, a_labels, dropout_rng = xs
                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, stats, x, n_labels, a_labels, dropout_rng)
                grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
                return (new_stats, grad_sum, loss_sum + loss), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (new_stats, grad_sum, loss_sum), _ = jax.lax.scan(
                micro,
                (state.batch_stats, zero_grads, jnp.zeros((), jnp.float32)),
                (feature, normal_labels, abnormal_labels, rng),
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grad_sum)
            loss = loss_sum / k
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    # microbatched inputs carry a leading (k, ...) axis: the bag axis that
    # shards over `data` is then axis 1, and the per-microbatch rng stack
    # stays replicated like the single rng
    bag_axis_spec = P(None, "data") if microbatched else P("data")
    batch_sharding = NamedSharding(mesh, bag_axis_spec)
    replicated = NamedSharding(mesh, P())
    state_sharding = None
    if state is not None and "model" in mesh.axis_names:
        from ..parallel.sharding import tensor_parallel_specs

        state_sharding = tensor_parallel_specs(state, mesh)
    multiprocess = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )
    if multiprocess and state_sharding is None:
        # host-local state leaves (first step after init/restore) are only
        # accepted by a multi-process pjit when their sharding is explicit
        # and fully replicated — which is exactly the DP state layout
        state_sharding = replicated
    jitted = jax.jit(
        step,
        in_shardings=(
            state_sharding, batch_sharding, batch_sharding, batch_sharding,
            replicated,
        ),
        donate_argnums=(0,),
    )
    if not multiprocess:
        return jitted

    def multihost_step(state, feature, normal_labels, abnormal_labels, rng):
        def host_leaf(x):
            # global arrays (every step after the first) pass through and
            # get donated; local/host leaves replicate onto the mesh
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return np.asarray(x)

        def globalize(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, batch_sharding, lambda idx: x[idx]
            )

        return jitted(
            jax.tree_util.tree_map(host_leaf, state),
            globalize(feature),
            globalize(normal_labels),
            globalize(abnormal_labels),
            np.asarray(rng),
        )

    return multihost_step


def make_eval_step(mesh: Optional[jax.sharding.Mesh] = None):
    """Build the jit'd scoring step.

    With a mesh the video-batch axis shards over ``data``. The returned
    callable also works when the mesh spans multiple processes (SURVEY §2.2
    DP row: "all-gather eval scores before AUC"): every process feeds the
    same full host batch, inputs are globalized onto the mesh
    (each process donating its addressable shards), and the sharded scores
    are all-gathered back so ``np.asarray`` on the result is valid on every
    host — the reference's single-GPU eval semantics, reproduced across a
    pod (its Lightning runner would silently compute per-rank AUC under
    DDP, src/runner.py:62-90).
    """

    def score(variables, apply_fn, feature, length):
        # pin full-f32 matmuls (TPU "highest"): scorer FLOPs are negligible
        # next to extraction, and DEFAULT-precision dots are not a stable
        # numeric contract — the same function re-lowered from a serialized
        # export (utils/aot.py) picked a lower-precision dot path and
        # drifted scores by up to 0.4 on a v5e. Pinning here and in
        # export_scorer makes live serving and AOT artifacts bit-equal.
        # CPU numerics are unchanged (f32 dots are exact there).
        with jax.default_matmul_precision("highest"):
            return apply_fn(variables, feature, length=length).scores

    if mesh is None:
        return jax.jit(score, static_argnums=(1,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        score,
        static_argnums=(1,),
        in_shardings=(None, batch, batch),
    )
    if all(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    ):
        return jitted  # single-process mesh: host arrays are global already

    from jax.experimental import multihost_utils

    def step(variables, apply_fn, feature, length):
        def host_leaf(x):
            # global arrays (e.g. DP/TP-sharded params coming out of the
            # multihost train step) pass through with their sharding intact
            # — np.asarray on a non-fully-addressable array would raise;
            # host-local leaves (restore/init before the first step)
            # replicate via pjit
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return np.asarray(x)

        def globalize(x, sharding):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        # params restored/initialized per-process live on local devices with
        # host-local shardings; hand pjit host buffers so it replicates them
        # onto the global mesh itself
        out = jitted(
            jax.tree_util.tree_map(host_leaf, variables),
            apply_fn,
            globalize(feature, batch),
            globalize(length, batch),
        )
        # replicate the sharded scores to every process so the host-side
        # AUC (ops/metrics.py) sees the full set
        return multihost_utils.process_allgather(out, tiled=True)

    return step


def eval_bucket(n_clips: int, minimum: int = 32) -> int:
    """Pad the clip axis to a power-of-two bucket: a handful of compiled
    shapes serve every test-video length (distinct lengths would otherwise
    each pay a full XLA compile — minutes apiece on TPU)."""
    bucket = minimum
    while bucket < n_clips:
        bucket *= 2
    return bucket


def evaluate(
    state: TrainState,
    dataset,
    frames_per_clip: int = 16,
    eval_step=None,
    batch_videos: int = 1,
    pad_groups: bool = False,
    prefetch_assembly: bool = True,
) -> "EvalResult":
    """Frame-level ROC/PR AUC over the test set (src/runner.py:62-79).

    Per video, clip scores are crop-averaged by the model, repeated x16 to
    frame level, concatenated over videos in dataset order, and scored
    against the concatenated GT lists. Videos run through padded length
    buckets; masking makes the padded scores bit-equal to unpadded runs
    (see MGFNForVideoAnomalyDetection.__call__). ``batch_videos > 1`` groups
    same-bucket videos into one device batch (with a mesh, the batch axis is
    the data-parallel axis), a throughput upgrade the reference's batch-1
    loop (src/runner.py:127-132) cannot express. ``pad_groups`` pads the
    final ragged group of each bucket to a full ``batch_videos`` by repeating
    its last video (padded outputs dropped): required for mesh-sharded eval
    (the sharded batch axis must divide evenly) and it also keeps the
    compiled-shape count at one per bucket.
    """
    eval_step = eval_step or make_eval_step()
    per_video: Dict[str, np.ndarray] = {}

    # group videos by bucket so one compiled shape serves each group
    buckets: Dict[int, list] = {}
    order = []
    for batch in eval_batches(dataset):
        if batch["label"] is None:
            raise ValueError(
                f"video {batch['filename']!r} has no frame-level ground truth"
            )
        n_clips = batch["feature"].shape[2]
        buckets.setdefault(eval_bucket(n_clips), []).append(batch)
        order.append((batch["filename"], np.asarray(batch["label"]).ravel()))

    # bounded dispatch pipeline: keep up to 2 score batches in flight (jit
    # is async — the device chews batch N while the host assembles N+1)
    # and materialize the oldest before dispatching further. Removing the
    # per-group np.asarray from the assembly loop stops the host from
    # serializing on every readback (through the axon tunnel a readback is
    # a ~350 ms RTT; on real hosts it still stalls assembly), while the
    # depth bound keeps device memory at ~2 group inputs instead of the
    # whole test set (a 10-crop 700-clip-bucket group is ~0.5 GB of HBM).
    # Scores are bit-identical to the serial order either way.
    pending = []

    def materialize(entry):
        group, lengths, scores = entry
        scores = np.asarray(scores)  # (n_group, bucket, 1)
        for k, item in enumerate(group):
            per_video[item["filename"]] = scores[k, : lengths[k], 0]

    def assemble():
        """Yield (group, lengths, feats) host batches, serial order."""
        for bucket, items in buckets.items():
            for start in range(0, len(items), batch_videos):
                group = items[start : start + batch_videos]
                n_group = len(group)
                n_rows = batch_videos if pad_groups else n_group
                feats = np.zeros(
                    (n_rows, 10, bucket, group[0]["feature"].shape[3]),
                    np.float32,
                )
                lengths = np.zeros((n_rows,), np.int32)
                for k in range(n_rows):
                    item = group[min(k, n_group - 1)]  # pad rows repeat last
                    n_clips = item["feature"].shape[2]
                    feats[k, :, :n_clips] = item["feature"][0]
                    lengths[k] = n_clips
                yield group, lengths, feats

    # host assembly is the other serial cost (measured: the eval path is
    # host-bound, docs/ROOFLINE.md eval roofline): prefetch assembles the
    # next groups on a worker thread while this thread dispatches and
    # waits on readbacks. Order-preserving, so scores stay bit-identical
    # (prefetch_assembly=False runs the serial order for A/B tests).
    group_iter = assemble()
    if prefetch_assembly:
        group_iter = prefetch(group_iter, depth=2)
    for group, lengths, feats in group_iter:
        scores = eval_step(
            state.variables, state.apply_fn,
            jnp.asarray(feats), jnp.asarray(lengths),
        )
        pending.append((group, lengths, scores))
        if len(pending) >= 2:
            materialize(pending.pop(0))
    for entry in pending:
        materialize(entry)

    all_preds, all_labels = [], []
    videos: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for filename, label in order:
        frame_preds = frame_level_scores(per_video[filename], frames_per_clip)
        all_preds.append(frame_preds)
        all_labels.append(label)
        videos[filename] = (frame_preds, label)
    preds = np.concatenate(all_preds)
    labels = np.concatenate(all_labels)
    if preds.shape != labels.shape:
        raise ValueError(
            f"frame count mismatch: {preds.shape} predictions vs "
            f"{labels.shape} labels"
        )
    return EvalResult(
        rec_auc=roc_auc(labels, preds),
        pr_auc=pr_auc(labels, preds),
        preds=preds,
        labels=labels,
        videos=videos,
    )


def _put_sharded(mesh, x, sharding):
    """Place a host/local array onto a (possibly multi-process) mesh.

    ``jax.device_put`` only accepts shardings whose devices are all
    addressable; on a mesh that spans processes each host instead donates
    its addressable shards of the (identical) host value.
    """
    if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


@dataclasses.dataclass
class EvalResult:
    rec_auc: float
    pr_auc: float
    preds: np.ndarray
    labels: np.ndarray
    # per-video (frame_scores, frame_labels), in dataset order — feeds the
    # per-class/FAR breakdown (report); None for hand-built results
    videos: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None

    def false_alarm_rate(self, threshold: float = 0.5) -> float:
        """FAR@threshold over the normal test videos (the VAD literature's
        convention — Sultani CVPR'18 §6; RTFM/MGFN papers report it at 0.5).
        Falls back to all negative frames when per-video data is absent."""
        from ..data.features import is_normal
        from ..ops.metrics import false_alarm_rate

        if self.videos is None:
            return false_alarm_rate(self.labels, self.preds, threshold)
        normal = [
            (s, l) for name, (s, l) in self.videos.items() if is_normal(name)
        ]
        if not normal:
            return float("nan")
        scores = np.concatenate([s for s, _ in normal])
        labels = np.concatenate([l for _, l in normal])
        return false_alarm_rate(labels, scores, threshold)

    def report(self, threshold: float = 0.5) -> Dict[str, Any]:
        """Literature-standard breakdown beyond the reference's two AUCs.

        The reference reports only the pooled frame-level ROC/PR AUC
        (src/runner.py:73-76); UCF-Crime papers additionally report the
        false-alarm rate on normal videos and per-class behavior. Returns:

        - ``rec_auc`` / ``pr_auc``: the pooled metrics (as logged);
        - ``far``: FAR@threshold over normal videos;
        - ``abnormal_auc``: ROC AUC over the abnormal videos only (how well
          anomalies localize *within* anomalous videos);
        - ``per_class``: for each anomaly class (data.features.video_class),
          ROC AUC over that class's videos + all normal videos (the
          standard per-class protocol) and its video/frame counts.

        Class slices whose labels are single-valued get ``auc: None``
        (ROC undefined there).
        """
        from ..data.features import video_class
        from ..ops.metrics import roc_auc

        if self.videos is None:
            raise ValueError("report() needs per-video data (videos=None)")

        def safe_auc(labels: np.ndarray, scores: np.ndarray):
            if labels.min() == labels.max():
                return None
            return roc_auc(labels, scores)

        by_class: Dict[str, list] = {}
        for name, (scores, labels) in self.videos.items():
            by_class.setdefault(video_class(name), []).append(
                (scores, np.asarray(labels))
            )
        normal = by_class.pop("Normal", [])
        normal_scores = (
            np.concatenate([s for s, _ in normal]) if normal else
            np.zeros((0,))
        )
        normal_labels = (
            np.concatenate([l for _, l in normal]) if normal else
            np.zeros((0,))
        )
        per_class: Dict[str, Dict[str, Any]] = {}
        abnormal_scores, abnormal_labels = [], []
        for cls in sorted(by_class):
            items = by_class[cls]
            scores = np.concatenate([s for s, _ in items])
            labels = np.concatenate([l for _, l in items])
            abnormal_scores.append(scores)
            abnormal_labels.append(labels)
            cls_auc = safe_auc(
                np.concatenate([labels, normal_labels]),
                np.concatenate([scores, normal_scores]),
            )
            per_class[cls] = {
                "auc": cls_auc,
                "videos": len(items),
                "frames": int(labels.size),
            }
        out: Dict[str, Any] = {
            "rec_auc": self.rec_auc,
            "pr_auc": self.pr_auc,
            "far": self.false_alarm_rate(threshold),
            "far_threshold": threshold,
            "normal_videos": len(normal),
            "abnormal_videos": sum(v["videos"] for v in per_class.values()),
            "per_class": per_class,
        }
        if abnormal_scores:
            out["abnormal_auc"] = safe_auc(
                np.concatenate(abnormal_labels),
                np.concatenate(abnormal_scores),
            )
        else:
            out["abnormal_auc"] = None
        return out

    def save_figure(self, path: str) -> None:
        """Prediction/GT overlay + ROC curve figure (the reference's W&B
        chart, src/runner.py:81-88), saved as a PNG."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..ops.metrics import roc_curve

        fig = plt.figure(figsize=(16, 4))
        fig.set_facecolor("white")
        ax1 = fig.add_subplot(1, 2, 1)
        ax2 = fig.add_subplot(1, 2, 2)
        ax1.plot(self.preds)
        ax1.plot(self.labels, alpha=0.5)
        ax1.set_title("frame scores vs ground truth")
        fpr, tpr, _ = roc_curve(self.labels, self.preds)
        ax2.plot(fpr, tpr)
        ax2.set_title(f"ROC (AUC={self.rec_auc:.4f})")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)


class VideoAnomalyDetectionRunner:
    """Epoch-loop orchestrator (role of the reference's LightningModule).

    Wires a model + optimizer config + data config into train/eval loops
    with checkpointing and logging. ``data_cfg`` / ``optimizer_cfg`` mirror
    the reference's YAML groups (configs/data/default.yaml,
    configs/runner/default.yaml).
    """

    def __init__(
        self,
        model,
        optimizer_cfg: Optional[Dict[str, Any]] = None,
        data_cfg: Optional[Dict[str, Any]] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        loggers: Iterable = (),
        checkpointer=None,
        seed: int = 0,
        eval_batch_videos: int = 8,
        precision: str = "32-true",
        grad_clip: Optional[float] = None,
        accumulate_grad_batches: int = 1,
    ):
        optimizer_cfg = dict(optimizer_cfg or {})
        self.precision = precision
        accumulate_grad_batches = int(accumulate_grad_batches)
        if accumulate_grad_batches < 1:
            raise ValueError(
                "trainer.accumulate_grad_batches must be >= 1, got "
                f"{accumulate_grad_batches}"
            )
        self.accumulate_grad_batches = accumulate_grad_batches
        self.model = model
        self.data_cfg = dict(data_cfg or {})
        self.mesh = mesh
        self.loggers = list(loggers)
        self.checkpointer = checkpointer
        self.seed = seed
        self.learning_rate = float(optimizer_cfg.get("learning_rate", 1e-3))
        self.tx = adam_with_l2(
            learning_rate=self.learning_rate,
            weight_decay=float(optimizer_cfg.get("weight_decay", 5e-4)),
            grad_clip=grad_clip,
        )
        if mesh is not None:
            # eval groups are padded to eval_batch_videos, so rounding up to
            # a mesh multiple keeps the sharded batch axis evenly divisible
            n = int(mesh.devices.size)
            eval_batch_videos = -(-eval_batch_videos // n) * n
        self.eval_batch_videos = eval_batch_videos
        self._train_step = make_train_step(
            mesh, precision=precision,
            microbatched=accumulate_grad_batches > 1,
        )
        self._eval_step = make_eval_step(mesh)
        self.state: Optional[TrainState] = None

    def init_state(self, example_batch: np.ndarray) -> TrainState:
        init_fn = jax.jit(functools.partial(self.model.init, train=True))
        variables = init_fn(
            {
                "params": jax.random.PRNGKey(self.seed),
                "dropout": jax.random.PRNGKey(self.seed + 1),
            },
            jnp.asarray(example_batch[:2]),
        )
        self.state = TrainState.create(self.model, variables, self.tx)
        if self.mesh is not None and "model" in self.mesh.axis_names:
            # DP x TP: weights/moments shard over the model axis; the step
            # is rebuilt with the state template so its in_shardings match
            from ..parallel.sharding import tensor_parallel_specs

            specs = tensor_parallel_specs(self.state, self.mesh)
            self.state = jax.tree_util.tree_map(
                functools.partial(_put_sharded, self.mesh), self.state, specs
            )
            self._train_step = make_train_step(
                self.mesh, state=self.state, precision=self.precision,
                microbatched=self.accumulate_grad_batches > 1,
            )
        return self.state

    def restore(self, state: TrainState) -> None:
        """Adopt a restored TrainState, re-placing it onto the mesh.

        Orbax restores arrays committed to one local device; a jitted step
        whose batch is mesh-sharded rejects mixed committed device sets
        (unlike the uncommitted fresh-init state), so a DP resume
        replicates the restored state over the mesh and a DP x TP resume
        re-shards it with tensor_parallel_specs (rebuilding the step
        around the sharded template).
        """
        self.state = state
        if self.mesh is None:
            return
        if "model" in self.mesh.axis_names:
            from ..parallel.sharding import tensor_parallel_specs

            specs = tensor_parallel_specs(state, self.mesh)
            self.state = jax.tree_util.tree_map(
                functools.partial(_put_sharded, self.mesh), state, specs
            )
            self._train_step = make_train_step(
                self.mesh, state=self.state, precision=self.precision,
                microbatched=self.accumulate_grad_batches > 1,
            )
        else:
            from ..parallel.sharding import replicate

            sharding = replicate(self.mesh)
            self.state = jax.tree_util.tree_map(
                lambda a: _put_sharded(self.mesh, a, sharding), state
            )

    def _log(self, metrics: Dict[str, float], step: int) -> None:
        for logger in self.loggers:
            logger.log(metrics, step)

    def fit(
        self,
        train_datasets: Dict[str, Any],
        valid_dataset=None,
        max_epochs: int = 1000,
        batch_size: int = 16,
        shuffle: bool = False,
        eval_every: int = 1,
        frames_per_clip: int = 16,
        figure_dir: Optional[str] = None,
        batch_videos: Optional[int] = None,
        handle_signals: Iterable[str] = (),
        max_steps: int = -1,
        log_every_n_steps: Optional[int] = None,
        checkpoint_every_n_epochs: int = 1,
    ) -> Optional[EvalResult]:
        """Train with per-epoch evaluation (reference flow: run.py:35 +
        src/runner.py loops; shuffle=False matches src/runner.py:108-124).

        ``handle_signals`` names signals (e.g. ``("SIGTERM", "SIGINT")``)
        that request a graceful stop: the current train step finishes, a
        final checkpoint is saved (kept as "last" regardless of top-k
        ranking), and fit returns — so a preempted TPU job (spot/preemptible
        VMs send SIGTERM with a grace period) resumes from the preemption
        step instead of the last eval epoch. The role Lightning's default
        SIGTERM handling plays for the reference trainer (run.py:32-35).
        Under multihost the local stop flags are all-gathered at every step
        boundary, so ANY process's signal stops every process at the SAME
        step (skewed signal delivery would otherwise deadlock the next
        grads collective); only process 0 (the one holding a checkpointer)
        writes.
        """
        normal, abnormal = train_datasets["normal"], train_datasets["abnormal"]
        rng = jax.random.PRNGKey(self.seed + 2)
        last_eval: Optional[EvalResult] = None
        if isinstance(handle_signals, str):  # preempt_signals=SIGTERM on
            handle_signals = (handle_signals,)  # the CLI parses as a string
        stop_signal = {"num": None, "sync": bool(handle_signals)}
        restore_handlers = {}
        if handle_signals:
            import signal

            def _request_stop(signum, frame):
                stop_signal["num"] = signum

            for name in handle_signals:
                signum = getattr(signal, name, None)
                if signum is None:
                    print(f"warning: unknown signal name {name!r} ignored")
                    continue
                try:
                    restore_handlers[signum] = signal.signal(
                        signum, _request_stop
                    )
                except ValueError:
                    pass  # not in the main thread: signals stay default
        try:
            return self._fit_loop(
                normal, abnormal, valid_dataset, max_epochs, batch_size,
                shuffle, eval_every, frames_per_clip, figure_dir,
                batch_videos, rng, last_eval, stop_signal,
                max_steps, log_every_n_steps, checkpoint_every_n_epochs,
            )
        finally:
            if restore_handlers:
                import signal

                for signum, handler in restore_handlers.items():
                    signal.signal(signum, handler)

    def _fit_loop(
        self, normal, abnormal, valid_dataset, max_epochs, batch_size,
        shuffle, eval_every, frames_per_clip, figure_dir, batch_videos,
        rng, last_eval, stop_signal, max_steps=-1, log_every_n_steps=None,
        checkpoint_every_n_epochs=1,
    ) -> Optional[EvalResult]:
        # Preemption stop decision. Multi-process runs must agree on the
        # stop BOUNDARY: the scheduler's signals land at slightly different
        # wall times, and a process that takes one more step than its peers
        # deadlocks in the grads collective — so with peers the local flag
        # is all-gathered each step and any process's signal stops everyone
        # at the same step. Single-process reads the flag directly.
        if jax.process_count() > 1 and stop_signal.get("sync", True):
            from jax.experimental import multihost_utils

            def stop_requested() -> bool:
                flags = multihost_utils.process_allgather(
                    np.asarray(stop_signal["num"] is not None)
                )
                return bool(np.any(flags))

        else:

            def stop_requested() -> bool:
                return stop_signal["num"] is not None

        # continue step numbering after a resume so new checkpoints don't
        # collide with (or overwrite) the restored ones
        step = int(self.state.step) if self.state is not None else 0
        # ... and continue the EPOCH count too: a run resumed at epoch 999
        # of 1000 must train the one remaining epoch, not max_epochs more.
        # Derived from the restored step (epochs are not persisted): the
        # epoch length is min(normal, abnormal) // batch_size (the
        # reference's drop_last dual-loader, data/features.train_batches) —
        # exact as long as batch_size matches the run that saved. This also
        # resumes the shuffle-order progression (train_batches seeds by
        # (seed, epoch)). With gradient accumulation each optimizer step
        # consumes `accumulate` loader batches (short trailing group
        # included), so the epoch length in optimizer steps rounds up.
        accumulate = self.accumulate_grad_batches
        num_workers = int(self.data_cfg.get("num_workers", 8) or 0)
        loader_batches = min(len(normal), len(abnormal)) // batch_size
        if loader_batches == 0:
            # the drop_last dual loader would yield NOTHING: every epoch
            # would be a silent no-op (nan epoch losses, state never
            # initialized, eval crashing on state=None) — name the
            # misconfiguration instead
            raise DataConfigError(
                f"batch_size={batch_size} exceeds the training data: "
                f"{len(normal)} normal / {len(abnormal)} abnormal videos "
                "yield zero batches under the drop-last dual loader "
                "(reference src/dataset.py pairing); lower "
                "data.batch_size or add videos"
            )
        steps_per_epoch = -(-loader_batches // accumulate)
        start_epoch = step // steps_per_epoch if steps_per_epoch else 0
        # per-step metric cadence (reference trainer knob
        # log_every_n_steps; null/None = every step) and the optimizer-step
        # budget (reference trainer knob max_steps; -1 = unlimited)
        log_every = max(1, int(log_every_n_steps or 1))
        hit_max = max_steps >= 0 and step >= max_steps
        for epoch in range(start_epoch, max_epochs):
            if hit_max:
                break
            epoch_losses = []
            t0 = time.time()
            batch_iter = train_batches(
                normal,
                abnormal,
                batch_size=batch_size,
                shuffle=shuffle,
                seed=self.seed,
                epoch=epoch,
            )
            group_iter = _grouped(batch_iter, accumulate)
            if num_workers > 0:
                # double-buffer host batch assembly behind device compute
                # (the reference's DataLoader num_workers overlap,
                # configs/data/default.yaml:3; 0 = synchronous, torch
                # semantics). Order-preserving, so pipelined == serial.
                group_iter = prefetch(group_iter, depth=2)
            for group in group_iter:
                if self.state is None:
                    self.init_state(group[0]["feature"])
                rng, step_rng = jax.random.split(rng)
                if accumulate == 1:
                    feature = jnp.asarray(group[0]["feature"])
                    n_labels = jnp.asarray(group[0]["normal_labels"])
                    a_labels = jnp.asarray(group[0]["abnormal_labels"])
                else:
                    # one optimizer step per group of `accumulate` loader
                    # batches (Lightning's accumulate_grad_batches): the
                    # jit'd step scans the stacked micro-batches and
                    # averages the gradients (make_train_step)
                    feature = jnp.asarray(
                        np.stack([b["feature"] for b in group])
                    )
                    n_labels = jnp.asarray(
                        np.stack([b["normal_labels"] for b in group])
                    )
                    a_labels = jnp.asarray(
                        np.stack([b["abnormal_labels"] for b in group])
                    )
                    step_rng = jax.random.split(step_rng, len(group))
                self.state, loss = self._train_step(
                    self.state, feature, n_labels, a_labels, step_rng,
                )
                loss = float(loss)
                epoch_losses.append(loss)
                # lr-Adam: the reference's LearningRateMonitor callback name
                # (configs/trainer/callbacks/lrmonitor.yaml, interval=step)
                if (step + 1) % log_every == 0:
                    self._log(
                        {"train_loss": loss, "lr-Adam": self.learning_rate},
                        step,
                    )
                step += 1
                if max_steps >= 0 and step >= max_steps:
                    hit_max = True
                    break
                if stop_requested():
                    stop_signal["stopped"] = True
                    break
            # the max_steps / preemption breaks above abandon the iterator
            # mid-epoch: close() it deterministically so the prefetch worker
            # stops loading now rather than at GC (matters on
            # non-refcounting interpreters); no-op when exhausted
            group_iter.close()
            if stop_signal.get("stopped"):
                # graceful preemption: skip eval (the grace period is short),
                # persist the exact step reached, and leave cleanly — resume
                # picks up from here (restore_latest + step continuation)
                saved = False
                if self.checkpointer is not None and self.state is not None:
                    self.checkpointer.save(
                        step=step, state=self.state, metric=None
                    )
                    self.checkpointer.wait()
                    saved = True
                self._log({"preempted_at_step": step}, step)
                source = (
                    f"signal {stop_signal['num']}"
                    if stop_signal["num"] is not None
                    else "peer-process signal"
                )
                if saved:
                    print(
                        f"{source}: checkpoint saved at step {step}, stopping"
                    )
                else:
                    print(f"{source}: stopping at step {step}")
                return last_eval
            metrics = {
                "epoch": epoch,
                "epoch_time_s": time.time() - t0,
                "train_loss_epoch": float(np.mean(epoch_losses)) if epoch_losses else float("nan"),
            }
            # the max_steps stop boundary always evaluates (so the final
            # checkpoint ranks by a real metric), like a normal epoch end
            if valid_dataset is not None and (
                (epoch + 1) % eval_every == 0 or hit_max
            ):
                last_eval = evaluate(
                    self.state, valid_dataset, frames_per_clip, self._eval_step,
                    batch_videos=batch_videos or self.eval_batch_videos,
                    pad_groups=True,
                )
                metrics["valid/rec_auc"] = last_eval.rec_auc
                metrics["valid/pr_auc"] = last_eval.pr_auc
                metrics["valid/far"] = last_eval.false_alarm_rate()
                if figure_dir:
                    try:
                        fig_path = os.path.join(
                            figure_dir, f"eval_epoch{epoch:04d}.png"
                        )
                        last_eval.save_figure(fig_path)
                        for logger in self.loggers:
                            if hasattr(logger, "log_image"):
                                logger.log_image("valid/overlay", fig_path, step)
                    except Exception as exc:  # cosmetic artifact: never let a
                        # figure failure kill the epoch's metrics/checkpoint
                        print(f"warning: eval figure failed: {exc}")
            self._log(metrics, step)
            # epoch cadence of the reference's ModelCheckpoint callback
            # (model_checkpoint.yaml `every_n_epochs`); stop boundaries
            # (max_steps, final epoch) always save so a finished run never
            # ends checkpoint-less between boundaries
            save_this_epoch = (
                (epoch + 1) % max(1, checkpoint_every_n_epochs) == 0
                or hit_max
                or epoch == max_epochs - 1
            )
            if (
                self.checkpointer is not None
                and self.state is not None
                and save_this_epoch
            ):
                ckpt_path = self.checkpointer.save(
                    step=step,
                    state=self.state,
                    metric=metrics.get("valid/rec_auc"),
                )
                uploaders = [
                    lg for lg in self.loggers
                    if getattr(lg, "log_model", False)
                    and hasattr(lg, "log_artifact")
                ]
                if ckpt_path and uploaders:
                    self.checkpointer.wait()  # orbax saves are async
                    for logger in uploaders:
                        logger.log_artifact(ckpt_path, f"checkpoint-step{step}")
            if hit_max:
                print(f"max_steps {max_steps} reached at step {step}, stopping")
                break
        if (
            last_eval is None
            and valid_dataset is not None
            and self.state is not None
        ):
            # a resumed run whose epoch budget is already spent (start_epoch
            # >= max_epochs) trains nothing — still report where the
            # restored model stands instead of exiting silently
            last_eval = evaluate(
                self.state, valid_dataset, frames_per_clip, self._eval_step,
                batch_videos=batch_videos or self.eval_batch_videos,
                pad_groups=True,
            )
            self._log(
                {
                    "valid/rec_auc": last_eval.rec_auc,
                    "valid/pr_auc": last_eval.pr_auc,
                    "valid/far": last_eval.false_alarm_rate(),
                },
                step,
            )
        if self.checkpointer is not None:
            # orbax saves are async; an unawaited save at interpreter exit
            # dies with "cannot schedule new futures" and leaves tmp dirs
            self.checkpointer.wait()
        return last_eval
