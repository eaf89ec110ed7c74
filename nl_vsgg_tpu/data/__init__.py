from . import schema
from .action_genome import AGTest, AGTrain
from .entry import Entry, empty_entry, pad_entry, pick_bucket
from .grounding import (FrameDetections, assign_labels_video, build_entry,
                        entry_to_pred, load_frame_features, wk_forward)
from .gt_entry import build_gt_entry
from .infer_entry import build_infer_entry
from .pipeline import GroundingPrefetcher, bucket_batches, bucket_events
from .synthetic import make_synthetic_entry

__all__ = ["schema", "AGTest", "AGTrain", "Entry", "empty_entry", "pad_entry",
           "pick_bucket", "FrameDetections", "assign_labels_video",
           "build_entry", "entry_to_pred", "load_frame_features", "wk_forward",
           "build_gt_entry", "build_infer_entry", "GroundingPrefetcher",
           "bucket_batches", "bucket_events",
           "make_synthetic_entry"]
