"""Host data-pipeline tests: threaded grounding prefetch + bucket batching."""

import time

import numpy as np
import pytest

from nl_vsgg_tpu.data.pipeline import GroundingPrefetcher, bucket_batches
from nl_vsgg_tpu.data.synthetic import make_synthetic_entry


def _entry(seed, bucket):
    rng = np.random.default_rng(seed)
    return make_synthetic_entry(rng, n_frames=3, objs_per_frame=1,
                                bucket_boxes=bucket, bucket_rels=bucket,
                                feat_dim=8)


def test_prefetcher_covers_all_indices():
    seen = []

    def ground(idx):
        time.sleep(0.002)
        return _entry(idx, 8)

    pf = GroundingPrefetcher(ground, list(range(20)), num_workers=4)
    for idx, e in pf:
        seen.append(idx)
        assert e is not None
    assert sorted(seen) == list(range(20))


def test_prefetcher_overlaps_workers():
    t0 = time.time()
    pf = GroundingPrefetcher(lambda i: (time.sleep(0.05), None)[1],
                             list(range(8)), num_workers=8)
    list(pf)
    assert time.time() - t0 < 0.05 * 8 * 0.8  # parallel, not serial


def test_prefetcher_propagates_errors():
    def boom(idx):
        if idx == 3:
            raise ValueError("bad video")
        return None

    pf = GroundingPrefetcher(boom, list(range(5)), num_workers=2)
    with pytest.raises(ValueError, match="bad video"):
        list(pf)


def test_bucket_batches_groups_and_flushes():
    entries = [(i, _entry(i, 8)) for i in range(5)] \
        + [(9, None)] + [(i, _entry(i, 16)) for i in range(3)]
    batches = list(bucket_batches(iter(entries), batch_size=2))
    sizes = sorted((b[0].n_boxes, len(b)) for b in batches)
    # 5 small -> 2+2+1, 3 big -> 2+1; None skipped
    assert sizes == [(8, 1), (8, 2), (8, 2), (16, 1), (16, 2)]
    for b in batches:
        assert len({e.n_boxes for e in b}) == 1
