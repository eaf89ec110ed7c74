"""nms_topk must yield exactly the first k survivors of full greedy NMS."""

import numpy as np

import jax.numpy as jnp

from nl_vsgg_tpu.ops.nms import batched_nms_mask, nms_mask, nms_topk


def _boxes(rng, n=200):
    b = rng.uniform(0, 300, (n, 4)).astype(np.float32)
    return np.concatenate([np.minimum(b[:, :2], b[:, 2:]),
                           np.maximum(b[:, :2], b[:, 2:]) + 20], 1)


def test_topk_equals_greedy_prefix(rng):
    boxes = _boxes(rng)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    order = np.argsort(-scores)
    greedy = [i for i in order if keep[i]]
    for k in (1, 10, 50, 150):
        idx, ok = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, k=k)
        got = np.asarray(idx)[np.asarray(ok)]
        np.testing.assert_array_equal(got, greedy[:len(got)])
        assert len(got) == min(k, len(greedy))


def test_topk_per_class(rng):
    boxes = _boxes(rng)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    cls = rng.integers(0, 5, 200).astype(np.int32)
    keep = np.asarray(batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(cls), 0.5))
    order = np.argsort(-scores)
    greedy = [i for i in order if keep[i]]
    idx, ok = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, k=80,
                       class_ids=jnp.asarray(cls))
    got = np.asarray(idx)[np.asarray(ok)]
    np.testing.assert_array_equal(got, greedy[:len(got)])


def test_topk_respects_valid_mask(rng):
    boxes = _boxes(rng, 20)
    scores = np.linspace(1, 0.1, 20).astype(np.float32)
    valid = np.ones(20, bool)
    valid[:5] = False  # the five highest scorers are invalid
    idx, ok = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.99, k=10,
                       valid=jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(ok)]
    assert (got >= 5).all()


def test_topk_exhausted_pool(rng):
    boxes = np.tile(np.array([[0, 0, 50, 50]], np.float32), (6, 1))
    scores = np.linspace(1, 0.5, 6).astype(np.float32)
    idx, ok = nms_topk(jnp.asarray(boxes), jnp.asarray(scores), 0.5, k=4)
    # identical boxes: only one survives; rest of the k slots invalid
    assert int(np.asarray(ok).sum()) == 1
    assert int(np.asarray(idx)[0]) == 0
