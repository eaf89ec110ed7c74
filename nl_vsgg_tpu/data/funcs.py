"""GT-matching utilities (lib/funcs.py).

`assign_relations` matches detector boxes to GT boxes at IoU >= 0.5 and
splits GT into found / supplementary sets per frame — the non-wks training
path's label source (lib/funcs.py:6-77; used by the reference's non-wks
branches only, SURVEY.md §2.5). Vectorized IoU replaces the Cython call.
"""

from __future__ import annotations

import numpy as np

from ..eval.recall import np_iou


def assign_relations(prediction_boxes: np.ndarray, pred_frames: np.ndarray,
                     gt_annotations, assign_iou_threshold: float = 0.5):
    """Per frame: match each GT box to its best prediction (IoU >= thresh).

    Returns (detector_found_idx, gt_relations, supply_relations) — lists per
    frame: matched prediction rows, the (pred_row, gt_record) pairs, and the
    GT records no prediction covered (to be supplied as extra boxes).
    """
    detector_found_idx, gt_rel, supply = [], [], []
    for f, frame_gt in enumerate(gt_annotations):
        rows = np.where(pred_frames == f)[0]
        boxes = prediction_boxes[rows]
        gt_boxes, records = [], []
        for rec in frame_gt:
            if "person_bbox" in rec:
                gt_boxes.append(np.asarray(rec["person_bbox"]).reshape(-1)[:4])
            else:
                gt_boxes.append(np.asarray(rec["bbox"]).reshape(-1)[:4])
            records.append(rec)
        found, rels, miss = [], [], []
        if len(boxes) and len(gt_boxes):
            iou = np_iou(np.asarray(gt_boxes, np.float64), boxes)
            taken = set()
            for g, rec in enumerate(records):
                order = np.argsort(-iou[g])
                hit = next((int(j) for j in order
                            if iou[g, j] >= assign_iou_threshold
                            and int(j) not in taken), None)
                if hit is None:
                    miss.append(rec)
                else:
                    taken.add(hit)
                    found.append(int(rows[hit]))
                    rels.append((int(rows[hit]), rec))
        else:
            miss = records
        detector_found_idx.append(found)
        gt_rel.append(rels)
        supply.append(miss)
    return detector_found_idx, gt_rel, supply
