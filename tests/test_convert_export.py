"""Inverse-converter (flax -> torch) round-trip tests.

The exporters must be exact inverses of the converters, making TPU-trained
checkpoints loadable in the reference's torch stack (the missing half of the
interchange layer, reference scripts/convert_official_to_hf.py:4-44).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from anomaly_detection_on_video_tpu.models import build_model
from anomaly_detection_on_video_tpu.models.i3d import i3d_8x8_r50, i3res50
from anomaly_detection_on_video_tpu.utils.convert import (
    convert_i3res50_state_dict,
    convert_mgfn_state_dict,
    convert_pytorchvideo_resnet_state_dict,
    export_i3res50_state_dict,
    export_mgfn_state_dict,
    export_pytorchvideo_resnet_state_dict,
)

from torch_oracles import TorchI3D8x8R50, TorchI3Res50, randomize_bn_stats


def assert_state_dicts_equal(a, b):
    assert set(a) == set(b), (set(a) ^ set(b))
    for key in a:
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key
        )


def assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = jax.tree_util.tree_leaves_with_path(b)
    assert len(fa) == len(fb)
    for (pa, la), (pb, lb) in zip(fa, fb):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_export_i3res50_round_trip_exact():
    torch.manual_seed(0)
    model = TorchI3Res50()
    randomize_bn_stats(model)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    back = export_i3res50_state_dict(convert_i3res50_state_dict(sd))
    assert_state_dicts_equal(sd, back)


def test_export_i3res50_nonlocal_inverse():
    """Exercises the non-local block export (the torch oracle has use_nl off)."""
    model = i3res50(use_nl=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
    back = convert_i3res50_state_dict(export_i3res50_state_dict(variables))
    assert_trees_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": back["params"], "batch_stats": back["batch_stats"]},
    )


def test_export_pytorchvideo_round_trip_exact():
    torch.manual_seed(1)
    model = TorchI3D8x8R50()
    randomize_bn_stats(model, seed=1)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    back = export_pytorchvideo_resnet_state_dict(
        convert_pytorchvideo_resnet_state_dict(sd)
    )
    assert_state_dicts_equal(sd, back)


def test_export_mgfn_inverse():
    _, model = build_model(
        "mgfn", dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 8, 25)),
        train=True,
    )
    back = convert_mgfn_state_dict(export_mgfn_state_dict(variables))
    assert_trees_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": back["params"], "batch_stats": back["batch_stats"]},
    )


def test_export_cli_reverse(tmp_path):
    """msgpack -> torch .pt via the CLI --reverse path."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import convert_checkpoint

    from anomaly_detection_on_video_tpu.utils.serialization import (
        save_variables,
    )

    _, model = build_model(
        "mgfn", dims=(16, 16, 32), depths=(1, 1, 1), dim_head=8, channels=24
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, 10, 8, 25)),
        train=True,
    )
    src = str(tmp_path / "vars.msgpack")
    dst = str(tmp_path / "out.pt")
    save_variables(src, variables)
    convert_checkpoint.main(["--kind", "mgfn-hf", "--reverse", src, dst])
    sd = torch.load(dst, weights_only=True)
    back = convert_mgfn_state_dict({k: v.numpy() for k, v in sd.items()})
    assert_trees_equal(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": back["params"], "batch_stats": back["batch_stats"]},
    )
