#!/usr/bin/env python
"""Checkpoint converter CLI (role of reference scripts/convert_official_to_hf.py).

Converts torch state dicts to flax msgpack variable files:

    python scripts/convert_checkpoint.py --kind mgfn-official mgfn.pt out.msgpack
    python scripts/convert_checkpoint.py --kind mgfn-hf hf_mgfn.pt out.msgpack
    python scripts/convert_checkpoint.py --kind i3d converted_ref_i3d.pt out.msgpack

and, with ``--reverse``, flax msgpack variables back to torch state dicts
(for validating or serving TPU-trained weights in the reference stack):

    python scripts/convert_checkpoint.py --kind mgfn-hf --reverse vars.msgpack out.pt

Load msgpack back with
``anomaly_detection_on_video_tpu.utils.serialization.load_variables``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src", help="torch .pt state dict")
    parser.add_argument("dst", help="output .msgpack variables file")
    parser.add_argument(
        "--kind",
        required=True,
        choices=["i3d", "i3d-8x8", "mgfn-hf", "mgfn-official", "rtfm",
                 "sultani"],
    )
    parser.add_argument(
        "--reverse",
        action="store_true",
        help="export flax msgpack variables (src) to a torch state dict (dst)",
    )
    args = parser.parse_args(argv)
    if not os.path.isfile(args.src):
        parser.error(f"src {args.src!r}: no such file")

    import torch

    from anomaly_detection_on_video_tpu.utils.convert import (
        convert_i3res50_state_dict,
        convert_mgfn_state_dict,
        convert_official_mgfn_state_dict,
        convert_pytorchvideo_resnet_state_dict,
        convert_rtfm_state_dict,
        convert_sultani_state_dict,
        export_i3res50_state_dict,
        export_mgfn_state_dict,
        export_pytorchvideo_resnet_state_dict,
        export_rtfm_state_dict,
        export_sultani_state_dict,
    )
    from anomaly_detection_on_video_tpu.utils.serialization import save_variables

    if args.reverse:
        from anomaly_detection_on_video_tpu.utils.serialization import (
            load_variables,
        )

        exporter = {
            "i3d": export_i3res50_state_dict,
            "i3d-8x8": export_pytorchvideo_resnet_state_dict,
            "mgfn-hf": export_mgfn_state_dict,
            "mgfn-official": None,
            "rtfm": export_rtfm_state_dict,
            "sultani": export_sultani_state_dict,
        }[args.kind]
        if exporter is None:
            raise SystemExit(
                "--reverse supports i3d / i3d-8x8 / mgfn-hf (the official "
                "MGFN layout is write-only in the reference too)"
            )
        sd = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in exporter(load_variables(args.src)).items()
        }
        torch.save(sd, args.dst)
        print(f"exported {args.kind} flax variables -> torch state dict {args.dst}")
        return

    state_dict = torch.load(args.src, map_location="cpu", weights_only=True)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    if isinstance(state_dict, dict) and "model_state" in state_dict:
        state_dict = state_dict["model_state"]  # pytorchvideo .pyth layout

    converter = {
        "i3d": convert_i3res50_state_dict,
        "i3d-8x8": convert_pytorchvideo_resnet_state_dict,
        "mgfn-hf": convert_mgfn_state_dict,
        "mgfn-official": convert_official_mgfn_state_dict,
        "rtfm": convert_rtfm_state_dict,
        "sultani": convert_sultani_state_dict,
    }[args.kind]
    variables = converter(state_dict)
    save_variables(args.dst, variables)
    print(f"converted {args.kind} checkpoint -> {args.dst}")


if __name__ == "__main__":
    main()
