"""Data-plane tests: feature contract, segmenting, GT builder, batching."""

import json
import os
import zipfile

import numpy as np
import pytest

from anomaly_detection_on_video_tpu.data import (
    add_magnitude,
    build_feature_dataset,
    build_ground_truth,
    eval_batches,
    parse_temporal_annotations,
    segment_features,
    train_batches,
)
from anomaly_detection_on_video_tpu.data.gt import frame_labels


def reference_segment(features, seg_length=32):
    """Direct transcription of the reference algorithm as an oracle
    (extract_features.py:170-183)."""
    divided = []
    for f in features.transpose(1, 0, 2):
        new_feat = np.zeros((seg_length, f.shape[1])).astype(np.float32)
        r = np.linspace(0, len(f), seg_length + 1, dtype=int)
        for i in range(seg_length):
            if r[i] != r[i + 1]:
                new_feat[i, :] = np.mean(f[r[i] : r[i + 1], :], 0)
            else:
                new_feat[i, :] = f[r[i], :]
        divided.append(new_feat)
    return np.array(divided, dtype=np.float32)


@pytest.mark.parametrize("n_clips", [3, 17, 32, 33, 64, 203])
def test_segment_matches_reference(rng, n_clips):
    feats = rng.randn(n_clips, 10, 8).astype(np.float32)
    np.testing.assert_allclose(
        segment_features(feats, 32), reference_segment(feats, 32), rtol=1e-6
    )


def test_add_magnitude():
    f = np.array([[[3.0, 4.0]]])
    out = add_magnitude(f)
    assert out.shape == (1, 1, 3)
    np.testing.assert_allclose(out[0, 0], [3.0, 4.0, 5.0])


def make_feature_zip(path, names, shape=(4, 10, 8), seed=0):
    rng = np.random.RandomState(seed)
    arrays = {}
    with zipfile.ZipFile(path, "w") as zf:
        for name in names:
            arr = rng.randn(*shape).astype(np.float32)
            arrays[name] = arr
            import io

            buf = io.BytesIO()
            np.save(buf, arr)
            zf.writestr(f"features/{name}", buf.getvalue())
    return arrays


def test_build_feature_dataset_train_split(tmp_path):
    zip_path = str(tmp_path / "train.zip")
    names = ["Normal_001_i3d.npy", "Abuse_001_i3d.npy", "Normal_002_i3d.npy"]
    arrays = make_feature_zip(zip_path, names, shape=(10, 32, 8))
    ds = build_feature_dataset("train", local_path=zip_path, dynamic_load=True)
    assert sorted(ds["normal"].filenames) == ["Normal_001_i3d.npy", "Normal_002_i3d.npy"]
    assert ds["abnormal"].filenames == ["Abuse_001_i3d.npy"]
    item = ds["abnormal"][0]
    assert item["feature"].shape == (10, 32, 9)  # +magnitude
    assert item["anomaly"] == 1.0
    np.testing.assert_allclose(
        item["feature"][..., :8], arrays["Abuse_001_i3d.npy"], rtol=1e-6
    )


def test_build_feature_dataset_test_with_gt(tmp_path):
    zip_path = str(tmp_path / "test.zip")
    names = ["Normal_9_i3d.npy", "Fighting_3_i3d.npy"]
    make_feature_zip(zip_path, names, shape=(4, 10, 8))
    gt = {"Normal_9_i3d.npy": [0.0] * 64, "Fighting_3": [1.0] * 64}
    gt_path = str(tmp_path / "gt.json")
    json.dump(gt, open(gt_path, "w"))
    ds = build_feature_dataset(
        "test", local_path=zip_path, dynamic_load=False, ground_truth_path=gt_path
    )
    # both full-filename and stem keys resolve
    labels = {item["filename"]: item["label"] for item in (ds[i] for i in range(2))}
    assert labels["Normal_9_i3d.npy"].sum() == 0
    assert labels["Fighting_3_i3d.npy"].sum() == 64


def test_train_batches_normal_first(tmp_path):
    zip_path = str(tmp_path / "train.zip")
    names = [f"Normal_{i}_i3d.npy" for i in range(4)] + [
        f"Abuse_{i}_i3d.npy" for i in range(5)
    ]
    make_feature_zip(zip_path, names, shape=(10, 32, 8))
    ds = build_feature_dataset("train", local_path=zip_path)
    batches = list(train_batches(ds["normal"], ds["abnormal"], batch_size=2))
    # min(4, 5) // 2 = 2 steps, drop_last
    assert len(batches) == 2
    b = batches[0]
    assert b["feature"].shape == (4, 10, 32, 9)
    np.testing.assert_array_equal(b["normal_labels"], [0.0, 0.0])
    np.testing.assert_array_equal(b["abnormal_labels"], [1.0, 1.0])


def test_build_feature_dataset_two_stream(tmp_path):
    """stream="both" pairs <stem>_i3d.npy with <stem>_flow.npy and
    concatenates on the feature axis before the magnitude channel."""
    zip_path = str(tmp_path / "train.zip")
    names = [
        "Normal_1_i3d.npy", "Normal_1_flow.npy",
        "Abuse_1_i3d.npy", "Abuse_1_flow.npy",
    ]
    arrays = make_feature_zip(zip_path, names, shape=(10, 32, 8))
    ds = build_feature_dataset("train", local_path=zip_path, stream="both")
    assert ds["normal"].filenames == ["Normal_1_i3d.npy"]
    assert ds["abnormal"].filenames == ["Abuse_1_i3d.npy"]
    item = ds["abnormal"][0]
    assert item["feature"].shape == (10, 32, 17)  # 8 + 8 + magnitude
    np.testing.assert_allclose(
        item["feature"][..., :8], arrays["Abuse_1_i3d.npy"], rtol=1e-6
    )
    np.testing.assert_allclose(
        item["feature"][..., 8:16], arrays["Abuse_1_flow.npy"], rtol=1e-6
    )
    # the magnitude channel is the L2 norm of the CONCATENATED vector
    np.testing.assert_allclose(
        item["feature"][..., 16],
        np.linalg.norm(item["feature"][..., :16], axis=-1),
        rtol=1e-5,
    )


def test_single_stream_modes_filter_two_stream_dirs(tmp_path):
    """A two-stream feature directory read as stream="rgb" must not treat
    the flow files as extra videos; stream="flow" selects only them."""
    d = tmp_path / "feats"
    d.mkdir()
    for name in ["Normal_1", "Abuse_1"]:
        np.save(d / f"{name}_i3d.npy", np.zeros((4, 10, 8), np.float32))
        np.save(d / f"{name}_flow.npy", np.ones((4, 10, 8), np.float32))
    rgb = build_feature_dataset("test", local_path=str(d))
    assert rgb.filenames == ["Abuse_1_i3d.npy", "Normal_1_i3d.npy"]
    assert rgb[0]["feature"][..., :8].sum() == 0.0
    flow = build_feature_dataset("test", local_path=str(d), stream="flow")
    assert flow.filenames == ["Abuse_1_flow.npy", "Normal_1_flow.npy"]
    assert (flow[0]["feature"][..., :8] == 1.0).all()


def test_two_stream_missing_mate_errors(tmp_path):
    zip_path = str(tmp_path / "train.zip")
    make_feature_zip(
        zip_path, ["Normal_1_i3d.npy", "Abuse_1_i3d.npy", "Abuse_1_flow.npy"]
    )
    with pytest.raises(ValueError, match="Normal_1_flow.npy"):
        build_feature_dataset("train", local_path=zip_path, stream="both")


def test_two_stream_clip_count_mismatch_errors(tmp_path):
    d = tmp_path / "feats"
    d.mkdir()
    np.save(d / "Abuse_1_i3d.npy", np.zeros((4, 10, 8), np.float32))
    np.save(d / "Abuse_1_flow.npy", np.zeros((3, 10, 8), np.float32))
    ds = build_feature_dataset("test", local_path=str(d), stream="both")
    with pytest.raises(ValueError, match="disagree"):
        ds[0]


def test_two_stream_test_split_gt_lookup(tmp_path):
    """GT attaches by the RGB filename / stem in two-stream mode, and the
    flow-only mode resolves stem-keyed GT too."""
    d = tmp_path / "feats"
    d.mkdir()
    np.save(d / "Fighting_3_i3d.npy", np.zeros((4, 10, 8), np.float32))
    np.save(d / "Fighting_3_flow.npy", np.zeros((4, 10, 8), np.float32))
    gt_path = str(tmp_path / "gt.json")
    json.dump({"Fighting_3": [1.0] * 64}, open(gt_path, "w"))
    both = build_feature_dataset(
        "test", local_path=str(d), stream="both", ground_truth_path=gt_path
    )
    item = both[0]
    assert item["feature"].shape == (4, 10, 17)
    assert item["label"].sum() == 64
    flow = build_feature_dataset(
        "test", local_path=str(d), stream="flow", ground_truth_path=gt_path
    )
    assert flow[0]["label"].sum() == 64


def test_unknown_stream_rejected(tmp_path):
    zip_path = str(tmp_path / "train.zip")
    make_feature_zip(zip_path, ["Normal_1_i3d.npy"])
    with pytest.raises(ValueError, match="stream"):
        build_feature_dataset("train", local_path=zip_path, stream="rgbd")


def test_eval_batches_permutation(tmp_path):
    zip_path = str(tmp_path / "test.zip")
    make_feature_zip(zip_path, ["Normal_1_i3d.npy"], shape=(7, 10, 8))
    ds = build_feature_dataset("test", local_path=zip_path)
    batch = next(eval_batches(ds))
    assert batch["feature"].shape == (1, 10, 7, 9)


def test_parse_annotations_and_frame_labels(tmp_path):
    annot = tmp_path / "annot.txt"
    annot.write_text(
        "Abuse028_x264.mp4  Abuse  165  240  -1  -1\n"
        "Normal_Videos_003_x264.mp4  Normal  -1  -1  -1  -1\n"
    )
    annots = parse_temporal_annotations(str(annot))
    assert annots["Abuse028_x264"]["first_event"] == (165, 240)
    gt = frame_labels(annots["Abuse028_x264"].values(), num_frame=200)
    assert sum(gt) == 200 - 165  # clamped at num_frame, end inclusive
    assert gt[164] == 0.0 and gt[165] == 1.0 and gt[199] == 1.0
    assert sum(frame_labels(annots["Normal_Videos_003_x264"].values(), 100)) == 0


def test_build_ground_truth_from_dir(tmp_path):
    feat_dir = tmp_path / "test_feats"
    feat_dir.mkdir()
    np.save(feat_dir / "Abuse028_x264_i3d.npy", np.zeros((5, 10, 8), np.float32))
    annot = tmp_path / "annot.txt"
    annot.write_text("Abuse028_x264.mp4  Abuse  10  20  40  50\n")
    gt = build_ground_truth(str(annot), str(feat_dir))
    assert list(gt) == ["Abuse028_x264"]
    assert len(gt["Abuse028_x264"]) == 80  # 5 clips * 16
    arr = np.asarray(gt["Abuse028_x264"])
    assert arr[10:21].sum() == 11 and arr[40:51].sum() == 11 and arr.sum() == 22


def test_ten_crop_video_frame_dataset_shim(rng):
    from anomaly_detection_on_video_tpu.data.video import TenCropVideoFrameDataset

    frames = rng.randint(0, 256, (20, 240, 320, 3), np.uint8)
    ds = TenCropVideoFrameDataset(frames)
    assert len(ds) == 2
    item = ds[1]  # tail clip of 4 frames, loop-padded
    assert item.shape == (10, 16, 224, 224, 3)
    np.testing.assert_allclose(item[:, 4], item[:, 0], atol=1e-6)
    with pytest.raises(IndexError):
        ds[2]


def test_minmax_transform_parity(rng):
    from anomaly_detection_on_video_tpu.ops.gtransforms import (
        pixel_minmax,
        rgb_channel_minmax,
    )

    x = rng.rand(2, 8, 8, 3).astype(np.float32) * 255
    out = np.asarray(pixel_minmax(x))
    assert out.min() == 0.0 and out.max() == 1.0
    out_c = np.asarray(rgb_channel_minmax(x))
    for c in range(3):
        assert abs(out_c[0, ..., c].min()) < 1e-6
        assert abs(out_c[0, ..., c].max() - 1.0) < 1e-6


def test_video_class_parsing():
    """UCF-Crime class = leading alphabetic run; every "Normal" name maps
    to the Normal class by the reference's labeling rule
    (src/dataset.py:54,129)."""
    from anomaly_detection_on_video_tpu.data.features import video_class

    assert video_class("Abuse028_x264.mp4") == "Abuse"
    assert video_class("RoadAccidents133_x264_i3d.npy") == "RoadAccidents"
    assert video_class("/some/dir/Shooting008_x264.avi") == "Shooting"
    assert video_class("Normal_Videos_308_x264.mp4") == "Normal"
    assert video_class("Normal_Videos944_x264_i3d.npy") == "Normal"
    # degenerate: no alphabetic prefix falls back to the stem itself
    assert video_class("123.avi") == "123.avi"


def test_dir_dataset_holds_no_file_descriptors(tmp_path):
    """Directory-backed datasets must not keep a descriptor per file: a
    persistent mmap per .npy would exhaust the fd limit on a real-scale
    feature directory (~1600 train files). dynamic_load (the default)
    loads per access; dynamic_load=False loads eagerly into RAM — neither
    holds fds open."""
    import os as _os

    rng = np.random.RandomState(0)
    d = tmp_path / "features"
    d.mkdir()
    names = [
        (f"Normal_{i}_i3d.npy" if i % 2 == 0 else f"Abuse_{i}_i3d.npy")
        for i in range(40)
    ]
    for name in names:
        np.save(d / name, rng.randn(10, 32, 8).astype(np.float32))

    def open_fds():
        return len(_os.listdir("/proc/self/fd"))

    for dynamic in (True, False):
        before = open_fds()
        ds = build_feature_dataset(
            "train", local_path=str(d), dynamic_load=dynamic
        )
        item = ds["normal"][0]
        assert item["feature"].shape == (10, 32, 9)
        assert open_fds() - before <= 2  # no fd per file
        # data still correct through the lazy path
        got = ds["abnormal"][1]
        np.testing.assert_allclose(
            got["feature"][..., :8], np.load(d / got["filename"]), rtol=1e-6
        )
