#!/usr/bin/env python
"""One-command TPU regression smoke: runs every device-facing path on the
real chip and prints one PASS/FAIL line per check.

Covers what the CPU test suite cannot: real-Mosaic compilation of the
Pallas kernels (interpret mode on CPU can pass where the TPU compiler
rejects — e.g. tiled-layout shape casts), real conv/layout behavior, and
rough throughput sanity against the measured baselines in
.claude/skills/verify/SKILL.md. Run after any change to ops/ or models/:

    python scripts/tpu_smoke.py            # ~5-10 min warm, longer cold

Exit code 0 iff every check passes (timing checks only WARN — the tunnel
makes absolute numbers noisy).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILURES = []


def check(name, fn):
    t0 = time.time()
    try:
        msg = fn() or ""
        print(f"PASS  {name:34s} {time.time()-t0:6.1f}s  {msg}", flush=True)
    except Exception as exc:
        FAILURES.append(name)
        print(f"FAIL  {name:34s} {time.time()-t0:6.1f}s  "
              f"{str(exc).splitlines()[0][:120]}", flush=True)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def smoke_extraction():
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (64, 240, 320, 3), np.uint8)
    ex = FeatureExtractor(dtype=jnp.bfloat16, batch=40)
    feats = ex.extract_frames(frames)
    assert feats.shape == (4, 10, 2048), feats.shape
    assert np.isfinite(feats).all()
    return f"features {feats.shape}"


def smoke_fused_kernels():
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models.i3d import i3res50

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 224, 224, 3).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    base = i3res50(dtype=jnp.bfloat16)
    fused = i3res50(dtype=jnp.bfloat16, fused_stem=True, fused_stage1=True)
    v = jax.jit(base.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 224, 224, 3)))
    a = np.asarray(base.apply(v, x), np.float32)
    b = np.asarray(fused.apply(v, x), np.float32)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 3e-2, f"fused-vs-unfused rel diff {rel:.3e}"
    return f"rel diff {rel:.2e} (real Mosaic compile)"


def smoke_device_flow():
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.ops.flow import compute_flow_device

    rng = np.random.RandomState(2)
    base = rng.rand(120, 160).astype(np.float32)
    # smooth via repeated box blur (no scipy dependency on device hosts)
    for _ in range(30):
        base = (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1) + base) / 5
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255
    shifted = np.roll(base, (2, -3), axis=(0, 1))  # dy=+2, dx=-3
    frames = np.repeat(np.stack([base, shifted]).astype(np.uint8)[..., None],
                       3, axis=-1)
    flow = np.asarray(compute_flow_device(jnp.asarray(frames))) * 20.0
    est = np.median(flow[1, 20:-20, 20:-20].reshape(-1, 2), axis=0)
    assert abs(est[0] - (-3)) < 0.5 and abs(est[1] - 2) < 0.5, est
    return f"translation est ({est[0]:+.2f}, {est[1]:+.2f}) vs (-3, +2)"


def smoke_tvl1_flow():
    """Device TV-L1 (ops/tvl1.py) on the real compiler: fori_loop duality
    iterations + gather warps, translation recovery at TV-L1's (tight)
    tolerance, and a rough frames/s figure."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.ops.tvl1 import compute_flow_tvl1

    rng = np.random.RandomState(7)
    base = rng.rand(240, 320).astype(np.float32)
    for _ in range(30):
        base = (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1) + base) / 5
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255
    shifted = np.roll(base, (2, -3), axis=(0, 1))
    frames = np.repeat(
        np.stack([base] + [shifted] * 9).astype(np.uint8)[..., None],
        3, axis=-1,
    )
    x = jnp.asarray(frames)
    flow = np.asarray(compute_flow_tvl1(x)) * 20.0  # compile + correctness
    est = np.median(flow[1, 20:-20, 20:-20].reshape(-1, 2), axis=0)
    assert abs(est[0] - (-3)) < 0.1 and abs(est[1] - 2) < 0.1, est
    t0 = time.time()
    sync(compute_flow_tvl1(x))
    rate = (frames.shape[0] - 1) / (time.time() - t0)
    return f"est ({est[0]:+.2f}, {est[1]:+.2f}) vs (-3, +2); {rate:.0f} fps"


def smoke_train_step():
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.training import TrainState
    from anomaly_detection_on_video_tpu.training.optim import adam_with_l2
    from anomaly_detection_on_video_tpu.training.runner import make_train_step

    rng = np.random.RandomState(3)
    _, model = build_model("mgfn")
    feature = jnp.asarray(rng.randn(8, 10, 32, 2049).astype(np.float32))
    v = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feature[:2], train=True)
    state = TrainState.create(model, v, adam_with_l2())
    step = make_train_step()
    state, loss = step(state, feature, jnp.zeros(4), jnp.ones(4),
                       jax.random.PRNGKey(2))
    loss = float(loss)
    assert np.isfinite(loss)
    return f"loss {loss:.4f}"


def smoke_throughput():
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    rng = np.random.RandomState(4)
    n_clips = 94
    frames = rng.randint(0, 256, (n_clips * 16, 240, 320, 3), np.uint8)
    ex = FeatureExtractor(dtype=jnp.bfloat16)
    ex.extract_frames(frames)  # compile
    x = jax.device_put(ex.pad_frames(frames))
    for _ in range(2):
        sync(ex._extract(ex.variables, x)[0])
    t0 = time.time()
    reps = 5
    out = None
    for _ in range(reps):
        out = ex._extract(ex.variables, x)
    sync(out[0])
    rate = reps * n_clips / (time.time() - t0)
    note = "" if rate > 150 else "  WARN: below the ~203 clips/s baseline"
    return f"{rate:.0f} clips/s{note}"


def smoke_int8():
    """int8 extraction (opt-in): calibration + quantized compile on the
    REAL compiler (the CPU test uses tiny shapes), feature agreement."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (2 * 16, 240, 320, 3), np.uint8)
    base = FeatureExtractor(dtype=jnp.bfloat16, batch=20)
    ref = base.extract_frames(frames)
    quant = FeatureExtractor(
        dtype=jnp.bfloat16, batch=20, variables=base.variables, quantize=True
    )
    out = quant.extract_frames(frames)
    cos = float(
        np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    )
    assert cos > 0.999, f"int8 feature cosine {cos}"
    return f"cosine {cos:.6f} vs bf16"


def smoke_int8_flow():
    """flow-stream int8: the dequantize calibration chain (resize ->
    ten-crop -> uint8 flow dequantize) compiles on the real toolchain and
    agrees with the full-precision flow pipeline."""
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.data.extraction import FeatureExtractor

    rng = np.random.RandomState(6)
    flow_u8 = rng.randint(0, 256, (2 * 16, 240, 320, 2), np.uint8)
    kw = dict(dtype=jnp.bfloat16, batch=20, stream="flow")
    base = FeatureExtractor(**kw)
    ref = base.extract_frames(flow_u8)
    quant = FeatureExtractor(**kw, variables=base.variables, quantize=True)
    out = quant.extract_frames(flow_u8)
    cos = float(
        np.sum(ref * out) / (np.linalg.norm(ref) * np.linalg.norm(out))
    )
    assert cos > 0.999, f"int8 flow feature cosine {cos}"
    return f"cosine {cos:.6f} vs bf16"


def smoke_aot_export():
    """AOT scorer export (utils/aot.py): the serialized ("cpu","tpu")
    StableHLO artifact must deserialize and execute on the REAL chip with
    scores matching the live jit path (the serve-anywhere claim)."""
    import jax
    import jax.numpy as jnp

    from anomaly_detection_on_video_tpu.models import build_model
    from anomaly_detection_on_video_tpu.utils.aot import (
        ExportedScorer,
        export_scorer,
        save_scorer_export,
    )
    import tempfile

    rng = np.random.RandomState(7)
    _, model = build_model("mgfn", dims=[16, 16, 32], depths=[1, 1, 1],
                           dim_head=8)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 32, 2049), jnp.float32), train=True)
    variables = dict(variables)
    blobs = export_scorer(model.apply, variables, buckets=(32,))
    with tempfile.TemporaryDirectory() as d:
        save_scorer_export(d, blobs, model_name="mgfn")
        loaded = ExportedScorer(d)
        feats = rng.randn(5, 10, 2048).astype(np.float32)
        aot = loaded.score(feats)
        # compare against the PRODUCTION live path (make_eval_step, what
        # infer.py serves with): both pin HIGHEST matmul precision, so the
        # artifact must be bit-equal on the real chip — an unpinned ad-hoc
        # jit drifts ~1e-3 here (DEFAULT-precision dots)
        from anomaly_detection_on_video_tpu.data.features import (
            pad_eval_batch,
        )
        from anomaly_detection_on_video_tpu.training.runner import (
            make_eval_step,
        )

        pad = pad_eval_batch(feats, 32)
        direct = np.asarray(
            make_eval_step()(
                variables, model.apply, jnp.asarray(pad),
                jnp.asarray([5], np.int32),
            )
        )[0, :5, 0]
    diff = float(np.abs(aot - direct).max())
    assert diff == 0.0, f"AOT vs live diff {diff}"
    return f"bucket-32 artifact on {jax.devices()[0].platform}, diff {diff:.2e}"


CHECKS = [
    ("extraction pipeline", smoke_extraction),
    ("fused Pallas kernels (opt-in)", smoke_fused_kernels),
    ("device optical flow", smoke_device_flow),
    ("device TV-L1 flow", smoke_tvl1_flow),
    ("MGFN train step", smoke_train_step),
    ("int8 extraction (opt-in)", smoke_int8),
    ("int8 flow stream (opt-in)", smoke_int8_flow),
    ("AOT scorer export", smoke_aot_export),
    ("extraction throughput", smoke_throughput),
]


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "--only",
        metavar="SUBSTR",
        help="run only checks whose name contains SUBSTR "
        "(available: " + "; ".join(name for name, _ in CHECKS) + ")",
    )
    args = parser.parse_args(argv)
    checks = [
        (name, fn)
        for name, fn in CHECKS
        if not args.only or args.only in name
    ]
    if not checks:
        raise SystemExit(f"--only {args.only!r} matches no checks")

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in checks:
        check(name, fn)
    if FAILURES:
        raise SystemExit(f"FAILED: {FAILURES}")
    print(f"all {len(checks)} TPU smoke checks passed")


if __name__ == "__main__":
    main()
