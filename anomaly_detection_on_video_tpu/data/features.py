"""Feature data plane: the on-disk contract and MIL batch iterators.

Mirrors the reference's feature layer (reference: src/dataset.py:24-142):

- features live in zip archives (``train.zip`` / ``test.zip``) or plain
  directories of ``<video>_i3d.npy`` files; train features are
  ``(10, 32, 2048)`` segment bags, test features ``(n_clips, 10, 2048)``;
- a video is *normal* iff ``"Normal"`` appears in its filename
  (src/dataset.py:54-70,129);
- ``add_magnitude`` appends the per-row L2 norm, 2048 -> 2049
  (src/dataset.py:121-124);
- the test split carries frame-level GT lists from ``ground_truth.json``
  (src/dataset.py:39-52).

Re-design notes: instead of torch DataLoaders (the reference's dual
(normal, abnormal) loader tuple, src/runner.py:108-124), training batches
are assembled host-side as one ``(2*bsz, 10, T, 2049)`` numpy array with
normal-first concat order (src/runner.py:31) ready for a single device put.
Network fetch from the HF hub is optional and gated (zero-egress friendly) —
pass ``local_path``; the default hub ids match the reference
(src/dataset.py:20-21).
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

DEFAULT_FEATURE_HUB = "jinmang2/ucf_crime_tencrop_i3d_seg32"
DEFAULT_FILENAMES = {"train": "train.zip", "test": "test.zip"}


def add_magnitude(feature: np.ndarray) -> np.ndarray:
    """Append the L2 feature magnitude channel: (..., T, 2048) -> 2049.

    Reference: FeatureDataset.add_magnitude (src/dataset.py:121-124) —
    norm over the last axis, concatenated as one extra channel.
    """
    magnitude = np.linalg.norm(feature, axis=-1, keepdims=True)
    return np.concatenate([feature, magnitude], axis=-1)


def pad_eval_batch(features: np.ndarray, bucket: int) -> np.ndarray:
    """(n_clips, n_crops, C) f32 features -> one (1, n_crops, bucket, C+1)
    eval batch: magnitude channel appended (add_magnitude), crop axis
    first, clip axis zero-padded to ``bucket`` (masked by the model's
    length argument — bit-exact vs unpadded, see models/mgfn). The ONE
    layout contract shared by the live scorer (infer.score_features) and
    the AOT artifacts (utils/aot.ExportedScorer.score): any padding or
    magnitude change must hit both paths at once."""
    n_clips, n_crops = features.shape[:2]
    out = np.zeros((1, n_crops, bucket, features.shape[-1] + 1), np.float32)
    out[0, :, :n_clips] = add_magnitude(features).transpose(1, 0, 2)
    return out


def is_normal(filename: str) -> bool:
    """Reference labeling rule: normal iff "Normal" in filename
    (src/dataset.py:54,129)."""
    return "Normal" in filename


def video_class(filename: str) -> str:
    """Anomaly class encoded in a UCF-Crime filename.

    UCF-Crime names videos ``<Class><index>_x264`` (``Abuse028_x264``,
    ``RoadAccidents133_x264``) and normal videos ``Normal_Videos_*``: the
    class is the leading alphabetic run of the basename, with every normal
    video mapped to "Normal" by the reference's labeling rule
    (src/dataset.py:54,129). Feeds the per-class evaluation breakdown
    (EvalResult.report) — absent from the reference, which reports only the
    pooled frame AUC (src/runner.py:73-76).
    """
    stem = os.path.basename(filename)
    if is_normal(stem):
        return "Normal"
    head = []
    for ch in stem:
        if not ch.isalpha():
            break
        head.append(ch)
    return "".join(head) or stem


@dataclass
class FeatureDataset:
    """A list of named feature arrays with lazy zip-backed loading.

    ``labels`` maps filename -> frame-level GT list for the test split.
    ``pairs`` maps an RGB filename to its flow mate for two-stream
    datasets (``build_feature_dataset(stream="both")``): the two arrays
    concatenate on the feature axis before the magnitude channel, so a
    (T, 10, 2048) pair becomes one (T, 10, 4097) feature.
    """

    filenames: List[str]
    _arrays: Dict[str, np.ndarray] = field(default_factory=dict)
    _zip_path: Optional[str] = None
    _zip_members: Dict[str, str] = field(default_factory=dict)
    _dir_path: Optional[str] = None
    labels: Optional[Dict[str, List[float]]] = None
    pairs: Dict[str, str] = field(default_factory=dict)
    _zipfile: Optional[zipfile.ZipFile] = field(default=None, repr=False)

    def __len__(self) -> int:
        return len(self.filenames)

    def _load(self, fname: str) -> np.ndarray:
        if fname in self._arrays:
            return self._arrays[fname]
        if self._dir_path is not None:
            # per-access load (fd opened and closed here): a persistent
            # mmap per file would hold len(dataset) descriptors and blow
            # the fd limit on real-scale feature directories
            return np.load(os.path.join(self._dir_path, fname))
        if self._zipfile is None:
            self._zipfile = zipfile.ZipFile(self._zip_path)
        with self._zipfile.open(self._zip_members[fname]) as f:
            return np.load(f)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        fname = self.filenames[idx]
        feature = self._load(fname)
        if fname in self.pairs:
            flow = self._load(self.pairs[fname])
            if flow.shape[:-1] != feature.shape[:-1]:
                raise ValueError(
                    f"{fname}: RGB {feature.shape} and flow {flow.shape} "
                    f"features disagree on clip/crop counts — were the two "
                    f"streams extracted from the same videos?"
                )
            feature = np.concatenate([feature, flow], axis=-1)
        out = {
            "feature": add_magnitude(feature).astype(np.float32),
            "anomaly": np.float32(0.0 if is_normal(fname) else 1.0),
            "filename": fname,
        }
        if self.labels is not None:
            # the hub ground_truth.json keys by npy filename
            # (src/dataset.py:138) while make_gt_ucf.py keys by video stem
            # (make_gt_ucf.py:39,52) — accept either
            key = fname
            if key not in self.labels:
                key = fname.replace("_i3d.npy", "").replace("_flow.npy", "")
            out["label"] = np.asarray(self.labels[key], dtype=np.float32)
        return out


def _index_zip(path: str, dynamic_load: bool) -> Tuple[List[str], Dict, Dict]:
    zipf = zipfile.ZipFile(path)
    filenames, arrays, members = [], {}, {}
    for member in zipf.infolist():
        if member.is_dir():
            continue
        fname = member.filename.split("/")[-1]
        if not fname.endswith(".npy"):
            continue
        filenames.append(fname)
        members[fname] = member.filename
        if not dynamic_load:
            with zipf.open(member) as f:
                arrays[fname] = np.load(f)
    return filenames, arrays, members


def _index_dir(path: str, dynamic_load: bool) -> Tuple[List[str], Dict, Dict]:
    """List a feature directory. ``dynamic_load`` (the default) keeps no
    arrays or file handles open — items np.load per access via
    ``FeatureDataset._dir_path`` (a persistent mmap per file would hold one
    fd per array and exhaust the fd limit at real dataset scale);
    ``dynamic_load=False`` eagerly loads everything into RAM."""
    filenames = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
    arrays = {}
    if not dynamic_load:
        arrays = {f: np.load(os.path.join(path, f)) for f in filenames}
    return filenames, arrays, {}


def _select_stream(
    filenames: List[str], stream: str
) -> Tuple[List[str], Dict[str, str]]:
    """Select/pair feature files per the stream mode.

    Extraction writes ``<stem>_i3d.npy`` (RGB) and ``<stem>_flow.npy``
    (optical flow) side by side (data/extraction.feature_filename), and
    32-segment pooling preserves both names, so one feature directory can
    hold both streams. ``rgb`` keeps only RGB files (a single-stream run
    over a two-stream directory must not treat flow files as extra
    videos), ``flow`` keeps only flow files, and ``both`` pairs each RGB
    file with its flow mate for feature-axis concatenation (the standard
    I3D two-stream fusion, Carreira & Zisserman 2017 — an extension: the
    reference trains RGB-only, src/dataset.py:20-21).
    """
    flow = {f for f in filenames if f.endswith("_flow.npy")}
    rgb = [f for f in filenames if f not in flow]
    if stream == "rgb":
        return rgb, {}
    if stream == "flow":
        return sorted(flow), {}
    if stream != "both":
        raise ValueError(f"stream must be rgb, flow, or both, got {stream!r}")
    pairs = {}
    for f in rgb:
        stem = f[: -len("_i3d.npy")] if f.endswith("_i3d.npy") else f[:-4]
        mate = f"{stem}_flow.npy"
        if mate not in flow:
            raise ValueError(
                f"stream='both' requires a flow mate for every RGB feature "
                f"file; {mate!r} is missing for {f!r} (extract with "
                f"--stream both, or use stream='rgb')"
            )
        pairs[f] = mate
    return rgb, pairs


def build_feature_dataset(
    mode: str = "train",
    local_path: Optional[str] = None,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
    revision: str = "main",
    dynamic_load: bool = True,
    ground_truth_path: Optional[str] = None,
    stream: str = "rgb",
):
    """Build train ({"normal", "abnormal"}) or test (flat) feature datasets.

    API mirrors the reference builder (src/dataset.py:73-95): with no
    ``local_path`` the zips are fetched from the HF hub (requires network);
    with ``local_path`` pointing at a zip file, a directory containing the
    zip, or a directory of .npy files, everything stays local.

    ``stream`` selects the feature stream(s) (see _select_stream): "rgb"
    (the reference protocol), "flow", or "both" (two-stream concatenation,
    2048+2048 -> 4096 before the magnitude channel — models then need
    ``channels=4096``).
    """
    assert mode in ("train", "test")

    if local_path is None:
        from huggingface_hub import hf_hub_download  # network path, optional
        from huggingface_hub.errors import LocalEntryNotFoundError

        try:
            filepath = hf_hub_download(
                repo_id=DEFAULT_FEATURE_HUB,
                filename=DEFAULT_FILENAMES[mode],
                cache_dir=cache_dir,
                revision=revision,
                repo_type="dataset",
            )
            if mode == "test" and ground_truth_path is None:
                ground_truth_path = hf_hub_download(
                    repo_id=DEFAULT_FEATURE_HUB,
                    filename="ground_truth.json",
                    repo_type="dataset",
                )
        except LocalEntryNotFoundError as exc:
            raise FileNotFoundError(
                f"cannot download {DEFAULT_FEATURE_HUB}/"
                f"{DEFAULT_FILENAMES[mode]} from the HF hub (no network or "
                f"not cached). Point the {mode} split at local features "
                f"instead: data.{mode}_path=<zip-or-dir> (or "
                f"data.local_path=<dir> for both splits)."
            ) from exc
    elif filename is not None:
        filepath = os.path.join(local_path, filename)
    else:
        filepath = local_path

    if os.path.isdir(filepath):
        candidate = os.path.join(filepath, DEFAULT_FILENAMES[mode])
        if os.path.exists(candidate):
            filepath = candidate

    if os.path.isdir(filepath):
        filenames, arrays, members = _index_dir(filepath, dynamic_load)
        zip_path, dir_path = None, filepath
    else:
        filenames, arrays, members = _index_zip(filepath, dynamic_load)
        zip_path, dir_path = filepath, None

    filenames, pairs = _select_stream(filenames, stream)

    if mode == "test":
        labels = None
        if ground_truth_path is not None:
            with open(ground_truth_path) as f:
                labels = json.load(f)
        return FeatureDataset(
            filenames=filenames,
            _arrays=arrays,
            _zip_path=zip_path,
            _zip_members=members,
            _dir_path=dir_path,
            labels=labels,
            pairs=pairs,
        )

    normal = [f for f in filenames if is_normal(f)]
    abnormal = [f for f in filenames if not is_normal(f)]

    def make(names):
        keys = list(names) + [pairs[n] for n in names if n in pairs]
        return FeatureDataset(
            filenames=names,
            _arrays={k: arrays[k] for k in keys if k in arrays},
            _zip_path=zip_path,
            _zip_members={k: members[k] for k in keys if k in members},
            _dir_path=dir_path,
            pairs={n: pairs[n] for n in names if n in pairs},
        )

    return {"normal": make(normal), "abnormal": make(abnormal)}


def train_batches(
    normal: FeatureDataset,
    abnormal: FeatureDataset,
    batch_size: int = 16,
    shuffle: bool = False,
    drop_last: bool = True,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """MIL training batches: (2*bsz, 10, T, 2049), normal first.

    Reproduces the reference's dual-loader semantics (src/runner.py:29-39,
    108-124): per step, ``batch_size`` normal bags then ``batch_size``
    abnormal bags concatenated along the batch axis; the epoch length is
    min(len(normal), len(abnormal)) // batch_size with drop_last. The
    reference uses shuffle=False; shuffle=True is available for real
    training runs.
    """
    n_idx = np.arange(len(normal))
    a_idx = np.arange(len(abnormal))
    if shuffle:
        rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2 ** 31))
        rng.shuffle(n_idx)
        rng.shuffle(a_idx)
    # cap both streams at the shorter one: the model's half-batch split
    # requires equal normal/abnormal counts in every step
    n_pairs = min(len(n_idx), len(a_idx))
    n_idx, a_idx = n_idx[:n_pairs], a_idx[:n_pairs]
    steps = n_pairs // batch_size
    if not drop_last and n_pairs % batch_size:
        steps += 1
    for step in range(steps):
        sl = slice(step * batch_size, (step + 1) * batch_size)
        n_items = [normal[i] for i in n_idx[sl]]
        a_items = [abnormal[i] for i in a_idx[sl]]
        feats = np.stack([it["feature"] for it in n_items + a_items])
        yield {
            "feature": feats,
            "normal_labels": np.stack([it["anomaly"] for it in n_items]),
            "abnormal_labels": np.stack([it["anomaly"] for it in a_items]),
        }


def eval_batches(dataset: FeatureDataset) -> Iterator[Dict[str, np.ndarray]]:
    """Per-video eval batches (batch 1), permuted to (1, 10, n_clips, 2049).

    Reference: validation_step permutes (1, n_clips, 10, 2049) ->
    (1, 10, n_clips, 2049) (src/runner.py:42-43).
    """
    for i in range(len(dataset)):
        item = dataset[i]
        feature = item["feature"]  # (n_clips, 10, 2049)
        yield {
            "feature": feature.transpose(1, 0, 2)[None],
            "label": item.get("label"),
            "filename": item["filename"],
            "anomaly": item["anomaly"],
        }
