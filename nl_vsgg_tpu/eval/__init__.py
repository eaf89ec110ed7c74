from .recall import SceneGraphEvaluator, evaluate_recall, intersect_2d, np_iou
from .recall_jax import (mean_recall_video, recall_video_no_constraint,
                         recall_video_semi, recall_video_with_constraint)

__all__ = ["SceneGraphEvaluator", "evaluate_recall", "intersect_2d", "np_iou",
           "mean_recall_video", "recall_video_no_constraint", "recall_video_semi",
           "recall_video_with_constraint"]
