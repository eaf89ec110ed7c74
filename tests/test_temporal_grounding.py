"""Temporal pseudo-grounding propagation tests: IoU-gated cosine-argmax
box handoff with confidence decay, sequential source update, force_ground."""

import numpy as np

from nl_vsgg_tpu.data.grounding import FrameDetections
from nl_vsgg_tpu.data.temporal_grounding import (PropagatedBox, propagate,
                                                 temporal_pseudo_ground)


def _drifting_video(rng, F=6, drift=6.0):
    """One object drifting right a few px per frame + a far distractor."""
    frames = []
    feat = rng.standard_normal(16).astype(np.float32)
    for f in range(F):
        rects = np.array([[10 + drift * f, 10, 60 + drift * f, 60],
                          [300, 300, 350, 350]], np.float32)
        feats = np.stack([feat + 0.01 * rng.standard_normal(16).astype(np.float32),
                          rng.standard_normal(16).astype(np.float32)])
        frames.append(FrameDetections(classes=np.array([7, 9]),
                                      confs=np.array([0.9, 0.9], np.float32),
                                      rects=rects, feats=feats))
    return frames, feat


def _seed(frames, f, feat):
    return PropagatedBox(frame=f, rect=frames[f].rects[0],
                         conf=0.8, feat=frames[f].feats[0])


def test_forward_propagation_follows_track(rng):
    frames, feat = _drifting_video(rng)
    seed = _seed(frames, 1, feat)
    out = temporal_pseudo_ground(frames, {0: [seed], 1: [seed]}, threshold=0.5)
    # frames 2..5 get grounded, each picking the drifting det (row 0)
    assert set(out) == {2, 3, 4, 5}
    for f in (2, 3, 4, 5):
        np.testing.assert_allclose(out[f][0].rect, frames[f].rects[0])
    # confidence decays multiplicatively by IoU each hop
    assert out[5][0].conf < out[2][0].conf < 0.8


def test_threshold_blocks_jump(rng):
    frames, feat = _drifting_video(rng, drift=80.0)  # big jumps: IoU ~ 0
    seed = _seed(frames, 0, feat)
    out = temporal_pseudo_ground(frames, {0: [seed]}, threshold=0.5)
    assert out == {}


def test_force_ground_overrides_threshold(rng):
    frames, feat = _drifting_video(rng, drift=80.0)
    seed = _seed(frames, 0, feat)
    out = temporal_pseudo_ground(frames, {0: [seed]}, threshold=0.5,
                                 force_ground=True)
    assert set(out) == {1, 2, 3, 4, 5}


def test_backward_propagation(rng):
    frames, feat = _drifting_video(rng)
    seed = _seed(frames, 4, feat)
    out = temporal_pseudo_ground(frames, {4: [seed], 5: [seed]}, threshold=0.5)
    assert set(out) == {0, 1, 2, 3}


def test_cosine_picks_matching_feature(rng):
    """Two overlapping candidates: the feature-similar one wins even when the
    other has slightly higher IoU."""
    feat = rng.standard_normal(16).astype(np.float32)
    other = rng.standard_normal(16).astype(np.float32)
    f0 = FrameDetections(classes=np.array([7]), confs=np.array([0.9], np.float32),
                         rects=np.array([[10, 10, 60, 60]], np.float32),
                         feats=feat[None])
    f1 = FrameDetections(classes=np.array([7, 7]),
                         confs=np.array([0.9, 0.9], np.float32),
                         rects=np.array([[11, 11, 61, 61],    # near-identical IoU
                                         [10, 10, 60, 60]], np.float32),
                         feats=np.stack([other, feat]))
    seed = PropagatedBox(frame=0, rect=f0.rects[0], conf=1.0, feat=f0.feats[0])
    out = propagate([f0, f1], {1: [seed]}, [1], set(), threshold=0.3)
    np.testing.assert_allclose(out[1][0].rect, f1.rects[1])


def test_gap_kills_the_chain(rng):
    """Reference 'Update' semantics (lib/assign_pseudo_label.py:267-268): the
    source becomes the visited frame's class boxes after EVERY step, so a
    frame where the IoU gate admits nothing ends the walk — later frames must
    not be grounded from a stale pre-gap source."""
    frames, feat = _drifting_video(rng)
    # frame 2's detections jump far away (gate fails), frame 3 would overlap
    # the ORIGINAL track again
    frames[2] = FrameDetections(
        classes=frames[2].classes, confs=frames[2].confs,
        rects=np.array([[500, 500, 550, 550], [300, 300, 350, 350]], np.float32),
        feats=frames[2].feats)
    seed = _seed(frames, 1, feat)
    out = temporal_pseudo_ground(frames, {0: [seed], 1: [seed]}, threshold=0.5)
    assert out == {}, "the chain must die at the gap, not bridge it"
