"""Smoke test for the train_e2e bench row (tools/bench_suite.py).

Runs the full composed loop — ground -> prefetch -> entry-cache -> place ->
train_step — at tiny shapes on the CPU backend and checks the system-level
invariants: every epoch sees every video, warm epochs are served from the
packed-Entry cache (the grounding engine is not re-entered), and the loop's
loss path stays finite. The real measurement runs on the chip via
`python tools/bench_suite.py --only train_e2e` (BASELINE.md row).
"""

import pytest

from tests.fixtures import load_tool


@pytest.mark.slow
def test_train_e2e_row_runs_and_warms(monkeypatch):
    bs = load_tool("bench_suite")
    train_mod = load_tool("train_STTran")
    calls = {"ground": 0}
    orig = train_mod._ground_video_uncached

    def counting(*a, **k):
        calls["ground"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(train_mod, "_ground_video_uncached", counting)
    results = bs.bench_train_e2e(n_videos=4, epochs=2, batch_videos=2,
                                 feat_dim=32, frames=3,
                                 bucket_boxes=16, bucket_rels=16)
    assert len(results) == 2
    for epoch, wall, fps, host in results:
        assert wall > 0 and fps > 0
    # the init sample grounds+caches video 0, the cold epoch grounds the
    # other 3; warm epochs must be pure cache hits — zero engine entries
    assert calls["ground"] == 1 + 3
    # warm epoch pays (almost) no grounding host time
    assert results[1][3]["ground"] <= results[0][3]["ground"]
