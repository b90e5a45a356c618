from .features import (
    FeatureDataset,
    add_magnitude,
    build_feature_dataset,
    eval_batches,
    train_batches,
)
from .gt import build_ground_truth, parse_temporal_annotations
from .segments import segment_features, segment_video_features
from .video import VideoFrameSource, decode_video_frames, iter_decoded_chunks

__all__ = [
    "FeatureDataset",
    "add_magnitude",
    "build_feature_dataset",
    "eval_batches",
    "train_batches",
    "build_ground_truth",
    "parse_temporal_annotations",
    "segment_features",
    "segment_video_features",
    "VideoFrameSource",
    "decode_video_frames",
    "iter_decoded_chunks",
]
