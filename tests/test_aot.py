"""AOT scorer export (utils/aot.py): serialize, reload, score — no model code.

The deployment feature the reference has no analog for: jax.export freezes
the scorer (weights baked in) to StableHLO artifacts per eval bucket, and a
serving host scores with ONLY the artifact directory.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.utils.aot import (
    ExportedScorer,
    export_buckets,
    export_scorer,
    save_scorer_export,
)


def tiny_mgfn(channels=2048):
    _, model = build_model(
        "mgfn", dims=[16, 16, 32], depths=[1, 1, 1], dim_head=8,
        channels=channels,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, channels + 1), jnp.float32),
        train=True,
    )
    return model, dict(variables)


def test_export_buckets_cover_every_video_length():
    from anomaly_detection_on_video_tpu.training.runner import eval_bucket

    buckets = export_buckets(100)
    assert buckets == sorted(set(buckets))
    for n in (1, 31, 32, 33, 100):
        assert eval_bucket(n) in buckets


def test_export_roundtrip_matches_direct_scoring(tmp_path):
    """ExportedScorer.score == infer.score_features on the same features,
    across bucket sizes and the padded tail."""
    import infer
    from anomaly_detection_on_video_tpu.training.runner import make_eval_step

    model, variables = tiny_mgfn()
    blobs = export_scorer(
        model.apply, variables, buckets=(32, 64), platforms=("cpu",)
    )
    save_scorer_export(
        tmp_path / "aot", blobs, model_name="mgfn", platforms=("cpu",)
    )

    loaded = ExportedScorer(str(tmp_path / "aot"))
    assert loaded.model_name == "mgfn"
    assert loaded.buckets == [32, 64]

    eval_step = make_eval_step()
    rng = np.random.RandomState(0)
    for n_clips in (5, 32, 40):
        feats = rng.randn(n_clips, 10, 2048).astype(np.float32)
        direct = infer.score_features(feats, model.apply, variables, eval_step)
        aot = loaded.score(feats)
        assert aot.shape == (n_clips,)
        np.testing.assert_allclose(aot, direct, atol=1e-5, rtol=0)


def test_exported_scorer_input_validation(tmp_path):
    model, variables = tiny_mgfn()
    blobs = export_scorer(
        model.apply, variables, buckets=(32,), n_crops=1, platforms=("cpu",)
    )
    save_scorer_export(
        tmp_path / "aot", blobs, model_name="mgfn", n_crops=1,
        platforms=("cpu",),
    )
    loaded = ExportedScorer(str(tmp_path / "aot"))

    with pytest.raises(ValueError, match="1 crops"):
        loaded.score(np.zeros((4, 10, 2048), np.float32))
    with pytest.raises(ValueError, match="2048-d features"):
        loaded.score(np.zeros((4, 1, 4096), np.float32))
    with pytest.raises(ValueError, match="largest exported bucket"):
        loaded.score(np.zeros((33, 1, 2048), np.float32))
    with pytest.raises(FileNotFoundError, match="manifest"):
        ExportedScorer(str(tmp_path / "not_an_export"))
    # a manifest naming a bucket whose artifact is gone must be caught at
    # load, not at the first matching video
    os.remove(tmp_path / "aot" / "scorer_b32.jaxexport")
    with pytest.raises(FileNotFoundError, match="bucket-32"):
        ExportedScorer(str(tmp_path / "aot"))


def test_infer_cli_export_then_serve_from_artifact(tmp_path):
    """infer.py --export writes a self-describing artifact dir; a second
    invocation scores a real video --from-export (no checkpoint), matching
    the --checkpoint run's scores on the same cached features."""
    import infer
    from tests.test_infer import make_sultani_checkpoint, write_video

    videos = tmp_path / "videos"
    videos.mkdir()
    write_video(videos / "Abuse_demo.avi", n_frames=40)
    make_sultani_checkpoint(tmp_path / "ckpts")

    # export (no --videos needed)
    infer.main(
        [
            "--checkpoint", str(tmp_path / "ckpts"),
            "--outdir", str(tmp_path / "unused"),
            "--export", str(tmp_path / "aot"),
            "--export-max-clips", "64",
            "--crops", "center",
        ]
    )
    manifest = json.loads((tmp_path / "aot" / "manifest.json").read_text())
    assert manifest["model_name"] == "sultani"
    assert manifest["n_crops"] == 1
    assert "tpu" in manifest["platforms"]  # serve-anywhere default

    common = [
        "--outdir", str(tmp_path / "scores_ckpt"),
        "--videos", str(videos),
        "--dtype", "float32",
        "--crops", "center",
        "--batch", "1",
        "--features-dir", str(tmp_path / "feats"),
    ]
    infer.main(["--checkpoint", str(tmp_path / "ckpts"), *common])
    ref = json.loads(
        (tmp_path / "scores_ckpt" / "Abuse_demo_scores.json").read_text()
    )

    common[1] = str(tmp_path / "scores_aot")
    infer.main(["--from-export", str(tmp_path / "aot"), *common])
    out = json.loads(
        (tmp_path / "scores_aot" / "Abuse_demo_scores.json").read_text()
    )
    assert out["model"] == "sultani"
    assert out["n_clips"] == ref["n_clips"]
    np.testing.assert_allclose(
        out["clip_scores"], ref["clip_scores"], atol=2e-6, rtol=0
    )


def test_infer_cli_from_export_crop_mismatch(tmp_path):
    """--from-export with a --crops mode the artifact was not exported for
    is a clean SystemExit before any extraction."""
    import infer

    model, variables = tiny_mgfn()
    blobs = export_scorer(
        model.apply, variables, buckets=(32,), n_crops=1, platforms=("cpu",)
    )
    save_scorer_export(
        tmp_path / "aot", blobs, model_name="mgfn", n_crops=1,
        platforms=("cpu",),
    )
    video = tmp_path / "v.avi"
    from tests.test_infer import write_video

    write_video(video)
    with pytest.raises(SystemExit, match="1 crops.*--crops ten"):
        infer.main(
            [
                "--from-export", str(tmp_path / "aot"),
                "--videos", str(video),
                "--outdir", str(tmp_path / "scores"),
            ]
        )


def test_export_pins_matmul_precision():
    """The artifact must carry explicit HIGHEST dot precision: a
    DEFAULT-precision lowering is not a stable numeric contract — on TPU a
    deserialized default-precision export recompiled to a lower-precision
    dot path and drifted scores by up to 0.4 vs the live jit (which pins
    the same precision in make_eval_step, keeping live == AOT bit-equal)."""
    from jax import export as jax_export

    model, variables = tiny_mgfn(channels=24)
    blobs = export_scorer(
        model.apply, variables, channels=24, buckets=(32,), platforms=None
    )
    text = jax_export.deserialize(blobs[32]).mlir_module()
    assert "HIGHEST" in text
    # every dot/convolution carries the pinned precision, none are DEFAULT
    assert "DEFAULT" not in text
