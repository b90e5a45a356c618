"""Golden tests: fused preprocessing vs an independent PIL oracle.

The oracle reproduces the reference's five-stage Compose semantics
(src/dataset.py:175-183) directly with PIL + numpy:
Resize(short side 256, BILINEAR) -> TenCrop(224) -> float
-> (x-114.75)/57.375 -> LoopPad(16).
"""

import numpy as np
import pytest
from PIL import Image

from anomaly_detection_on_video_tpu.ops import (
    loop_pad_indices,
    preprocess_frames,
    standardize,
    ten_crop,
    ten_crop_positions,
)
from anomaly_detection_on_video_tpu.ops.resize import (
    resize_bilinear_exact,
    short_side_size,
)


def pil_resize_short_side(img: Image.Image, size: int = 256) -> Image.Image:
    w, h = img.size
    if h <= w:
        oh, ow = size, int(size * w / h)
    else:
        oh, ow = int(size * h / w), size
    return img.resize((ow, oh), Image.BILINEAR)


def pil_five_crop(img: Image.Image, size: int = 224):
    w, h = img.size
    tl = img.crop((0, 0, size, size))
    tr = img.crop((w - size, 0, w, size))
    bl = img.crop((0, h - size, size, h))
    br = img.crop((w - size, h - size, w, h))
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    center = img.crop((left, top, left + size, top + size))
    return [tl, tr, bl, br, center]


def pil_ten_crop(img: Image.Image, size: int = 224):
    flipped = img.transpose(Image.FLIP_LEFT_RIGHT)
    return pil_five_crop(img, size) + pil_five_crop(flipped, size)


def oracle_preprocess(frames_u8: np.ndarray, frames_per_clip: int = 16) -> np.ndarray:
    """Reference-semantics preprocessing for a whole video, channels-last."""
    per_frame = []
    for frame in frames_u8:
        img = pil_resize_short_side(Image.fromarray(frame))
        crops = [np.asarray(c, dtype=np.float32) for c in pil_ten_crop(img)]
        per_frame.append(np.stack(crops))  # (10, 224, 224, 3)
    stacked = np.stack(per_frame)  # (n_frames, 10, 224, 224, 3)
    normed = (stacked - 114.75) / 57.375

    n_frames = len(frames_u8)
    n_clips = (n_frames - 1) // frames_per_clip + 1
    clips = []
    for c in range(n_clips):
        clip = normed[c * frames_per_clip : (c + 1) * frames_per_clip]
        length = clip.shape[0]
        if length != frames_per_clip:  # LoopPad semantics
            n_pad = frames_per_clip - length
            pad = [clip] * (n_pad // length)
            if n_pad % length > 0:
                pad += [clip[: n_pad % length]]
            clip = np.concatenate([clip] + pad, axis=0)
        clips.append(clip.transpose(1, 0, 2, 3, 4))  # (10, T, H, W, C)
    return np.stack(clips)  # (n_clips, 10, T, 224, 224, 3)


@pytest.mark.parametrize("hw", [(240, 320), (320, 240), (256, 256), (300, 530)])
def test_resize_matches_pil_bitexact(rng, hw):
    h, w = hw
    frames = rng.randint(0, 256, (3, h, w, 3), dtype=np.uint8)
    oh, ow = short_side_size(h, w, 256)
    ours = np.asarray(resize_bilinear_exact(frames, oh, ow))
    for i, frame in enumerate(frames):
        golden = np.asarray(pil_resize_short_side(Image.fromarray(frame)))
        np.testing.assert_array_equal(ours[i], golden)


def test_ten_crop_matches_torchvision_order(rng):
    frame = rng.randint(0, 256, (256, 341, 3), dtype=np.uint8)
    ours = np.asarray(ten_crop(frame[None], 224))  # (10, 1, 224, 224, 3)
    golden = pil_ten_crop(Image.fromarray(frame), 224)
    for i in range(10):
        np.testing.assert_array_equal(ours[i, 0], np.asarray(golden[i]))


def test_ten_crop_positions_center_rounding():
    # 117/2 = 58.5 -> banker's round to 58, as torchvision int(round(...))
    assert ten_crop_positions(256, 341, 224)[4] == (16, 58)


def test_standardize_values():
    x = np.array([0.0, 114.75, 255.0], dtype=np.float32)
    got = np.asarray(standardize(x))
    np.testing.assert_allclose(got, (x - 114.75) / 57.375, rtol=1e-6)


def test_loop_pad_indices_tail():
    # 20 frames, 16 per clip -> 2 clips; tail length 4 loops 0..3
    idx = loop_pad_indices(20, 16)
    assert idx.shape == (2, 16)
    np.testing.assert_array_equal(idx[0], np.arange(16))
    np.testing.assert_array_equal(idx[1], 16 + np.tile(np.arange(4), 4))


def test_preprocess_frames_matches_oracle(rng):
    frames = rng.randint(0, 256, (20, 240, 320, 3), dtype=np.uint8)
    ours = np.asarray(preprocess_frames(frames))
    golden = oracle_preprocess(frames)
    assert ours.shape == golden.shape == (2, 10, 16, 224, 224, 3)
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_center_crop_is_ten_crop_row4(rng):
    from anomaly_detection_on_video_tpu.ops.gtransforms import (
        center_crop,
        ten_crop,
    )

    frames = rng.randint(0, 256, (3, 57, 71, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(center_crop(frames, 32)),
        np.asarray(ten_crop(frames, 32))[4],
    )
