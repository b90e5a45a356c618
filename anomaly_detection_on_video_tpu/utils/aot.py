"""Ahead-of-time scorer export: compile once, serve anywhere.

The TPU-native deployment step the reference's torch stack has no analog
for: ``jax.export`` lowers the jit'd scoring function (weights baked in as
constants) to serialized StableHLO, one artifact per eval bucket
(training/runner.eval_bucket's power-of-two clip padding). A serving host
then loads and calls the artifacts WITHOUT the model code, the checkpoint,
or a Python-side trace — model updates ship as data files, and the scoring
computation is frozen at export time (an auditable deployment unit).

Artifacts are exported for ``("cpu", "tpu")`` by default, so the same
directory serves a TPU fleet and a CPU canary. Consumed by
``infer.py --export DIR`` / ``infer.py --from-export DIR``.

The exported function reproduces make_eval_step's scoring exactly:
``apply_fn(variables, feature, length).scores`` on ``(1, n_crops, bucket,
channels+1)`` float32 with the magnitude channel appended and zero padding
masked by ``length`` (bit-exact vs unpadded — models/mgfn).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

MANIFEST_NAME = "manifest.json"
_ARTIFACT_FMT = "scorer_b{bucket}.jaxexport"


def export_buckets(max_clips: int, minimum: int = 32) -> list:
    """Every eval bucket a video of <= max_clips clips can hit."""
    from anomaly_detection_on_video_tpu.training.runner import eval_bucket

    buckets, n = {eval_bucket(max_clips, minimum)}, 1
    while n <= max_clips:
        buckets.add(eval_bucket(n, minimum))
        n *= 2
    return sorted(buckets)


def export_scorer(
    apply_fn,
    variables,
    *,
    channels: int = 2048,
    n_crops: int = 10,
    buckets: Sequence[int] = (32, 64, 128, 256),
    platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
) -> Dict[int, bytes]:
    """Serialize the scorer per bucket with ``variables`` baked in.

    ``channels`` is the scorer's feature width BEFORE the magnitude channel
    (2048 reference, 4096 two-stream). Returns {bucket: serialized bytes}.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    def fn(feature, length):
        # full-f32 matmuls, matching the live scorer (make_eval_step): a
        # DEFAULT-precision lowering is not a stable numeric contract — the
        # deserialized artifact's dots recompiled to a lower-precision path
        # on TPU and drifted scores by up to 0.4 vs the live jit. With the
        # precision pinned on both sides the artifact is bit-equal to live.
        with jax.default_matmul_precision("highest"):
            return apply_fn(variables, feature, length=length).scores

    exported = {}
    for bucket in sorted(set(int(b) for b in buckets)):
        exp = jax_export.export(
            jax.jit(fn),
            platforms=tuple(platforms) if platforms else None,
        )(
            jax.ShapeDtypeStruct(
                (1, n_crops, bucket, channels + 1), jnp.float32
            ),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        )
        exported[bucket] = exp.serialize()
    return exported


def save_scorer_export(
    outdir: str,
    exported: Dict[int, bytes],
    *,
    model_name: str,
    channels: int = 2048,
    n_crops: int = 10,
    stream: str = "rgb",
    platforms: Iterable[str] = ("cpu", "tpu"),
) -> str:
    """Write artifacts + manifest.json; returns the manifest path."""
    import jax

    from anomaly_detection_on_video_tpu.utils.npyio import atomic_write_bytes

    os.makedirs(outdir, exist_ok=True)
    for bucket, blob in exported.items():
        atomic_write_bytes(
            os.path.join(outdir, _ARTIFACT_FMT.format(bucket=bucket)), blob
        )
    manifest = {
        "format": "anomaly_detection_on_video_tpu.scorer_export.v1",
        "model_name": model_name,
        "channels": channels,
        "n_crops": n_crops,
        "stream": stream,
        "buckets": sorted(exported),
        "platforms": sorted(platforms),
        "jax_version": jax.__version__,
    }
    path = os.path.join(outdir, MANIFEST_NAME)
    atomic_write_bytes(path, json.dumps(manifest, indent=1).encode())
    return path


class ExportedScorer:
    """Scores features via deserialized AOT artifacts (no model code).

    ``score`` accepts the same input as infer.score_features —
    ``(n_clips, n_crops, channels)`` float32 — and reproduces its padding
    and magnitude semantics against the bucket whose artifact matches.
    """

    def __init__(self, directory: str):
        from jax import export as jax_export

        manifest_path = os.path.join(directory, MANIFEST_NAME)
        if not os.path.isfile(manifest_path):
            raise FileNotFoundError(
                f"{directory!r} is not a scorer export (no {MANIFEST_NAME}; "
                "create one with infer.py --export)"
            )
        with open(manifest_path) as f:
            try:
                self.manifest = json.load(f)
            except json.JSONDecodeError as exc:
                raise ValueError(
                    f"corrupt manifest {manifest_path!r}: {exc}"
                ) from exc
        self.model_name = self.manifest.get("model_name", "unknown")
        self.channels = int(self.manifest.get("channels", 2048))
        self.n_crops = int(self.manifest.get("n_crops", 10))
        self.stream = self.manifest.get("stream", "rgb")
        self._exported = {}
        for bucket in self.manifest.get("buckets", []):
            path = os.path.join(
                directory, _ARTIFACT_FMT.format(bucket=bucket)
            )
            if not os.path.isfile(path):
                raise FileNotFoundError(
                    f"scorer export {directory!r} is missing the bucket-"
                    f"{bucket} artifact named by its manifest ({path})"
                )
            with open(path, "rb") as f:
                exported = jax_export.deserialize(f.read())
            # jit the call wrapper once per bucket: repeated serving calls
            # reuse one compiled executable instead of re-dispatching
            # through Exported.call's per-invocation wrapper
            import jax

            self._exported[int(bucket)] = jax.jit(exported.call)
        if not self._exported:
            raise ValueError(
                f"scorer export {directory!r} has no bucket artifacts"
            )
        self.buckets = sorted(self._exported)

    def score(self, features: np.ndarray) -> np.ndarray:
        """(n_clips, n_crops, channels) f32 -> (n_clips,) anomaly scores."""
        features = np.asarray(features, np.float32)
        n_clips, n_crops = features.shape[:2]
        if n_crops != self.n_crops:
            raise ValueError(
                f"this export was built for {self.n_crops} crops per clip, "
                f"got {n_crops} (re-export with the matching --crops)"
            )
        if features.shape[-1] != self.channels:
            raise ValueError(
                f"this export scores {self.channels}-d features, got "
                f"{features.shape[-1]}-d (re-export for this stream mode)"
            )
        bucket = next((b for b in self.buckets if b >= n_clips), None)
        if bucket is None:
            raise ValueError(
                f"video has {n_clips} clips but the largest exported "
                f"bucket is {self.buckets[-1]}; re-export with a larger "
                "--export-max-clips"
            )
        from anomaly_detection_on_video_tpu.data.features import (
            pad_eval_batch,
        )

        feats = pad_eval_batch(features, bucket)
        scores = self._exported[bucket](
            feats, np.asarray([n_clips], np.int32)
        )
        return np.asarray(scores)[0, :n_clips, 0]
