from .recall import SceneGraphEvaluator, evaluate_recall, intersect_2d, np_iou

__all__ = ["SceneGraphEvaluator", "evaluate_recall", "intersect_2d", "np_iou"]
