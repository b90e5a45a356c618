"""Optical-flow stream for two-stream I3D extraction.

The reference repo ships RGB-only extraction; the two-stream (RGB +
optical-flow) protocol is the standard I3D recipe (Carreira & Zisserman)
and one of the driver's benchmark configs. Host-side dense flow via
OpenCV Farneback (TV-L1 is not available in this OpenCV build; the
device backends provide Farneback in ops/flow.py and a from-scratch
TV-L1 in ops/tvl1.py), with the usual I3D-flow normalization: truncate
to [-bound, bound], scale to [-1, 1].

Flow frames feed the same fused resize/ten-crop pipeline; the I3D flow
stream is models/i3d.py with 2 input channels (the stem conv infers its
input width from the data).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

FLOW_BOUND = 20.0


def compute_flow(frames: np.ndarray, bound: float = FLOW_BOUND) -> np.ndarray:
    """Dense Farneback flow between consecutive frames.

    frames: uint8 (N, H, W, 3) RGB. Returns float32 (N, H, W, 2) in
    [-1, 1] (frame 0 gets zero flow so clip framing matches the RGB stream).
    """
    if cv2 is None:
        raise RuntimeError("OpenCV is required for optical flow")
    gray = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    flows = [np.zeros((*gray[0].shape, 2), np.float32)]
    for prev, cur in zip(gray[:-1], gray[1:]):
        flow = cv2.calcOpticalFlowFarneback(
            prev, cur, None,
            pyr_scale=0.5, levels=3, winsize=15, iterations=3,
            poly_n=5, poly_sigma=1.2, flags=0,
        )
        flows.append(flow)
    out = np.stack(flows)
    np.clip(out, -bound, bound, out=out)
    return out / bound


def flow_to_uint8(flow: np.ndarray) -> np.ndarray:
    """Quantize [-1, 1] flow to uint8 (the on-disk/transfer-friendly form
    the resize/crop pipeline consumes; dequantized by flow_standardize)."""
    return np.round((flow + 1.0) * 127.5).astype(np.uint8)


def flow_standardize(x: np.ndarray) -> np.ndarray:
    """Inverse of flow_to_uint8 (uint8 -> [-1, 1] float32)."""
    return x.astype(np.float32) / 127.5 - 1.0
