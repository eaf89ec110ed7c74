"""Device-resident Entry store (data/device_store.py): gather parity vs
place_entries, bucket grouping, byte budget, and dtype handling."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from nl_vsgg_tpu.data.device_store import DeviceEntryStore
from nl_vsgg_tpu.data.entry import Entry
from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
from nl_vsgg_tpu.train import place_entries


def _entries(rng, n, rels=16, boxes=24, frames=3, feat=32):
    return [make_synthetic_entry(rng, n_frames=frames, objs_per_frame=2,
                                 bucket_boxes=boxes, bucket_rels=rels,
                                 feat_dim=feat) for _ in range(n)]


def test_gather_matches_place_entries(rng):
    es = _entries(rng, 6)
    store = DeviceEntryStore()
    for i, e in enumerate(es):
        assert store.add(i, e)
    store.seal()
    idx = [4, 1, 5]
    got = store.gather(idx)
    want = place_entries([es[i] for i in idx])
    for f in dataclasses.fields(Entry):
        a, b = np.asarray(getattr(got, f.name)), np.asarray(getattr(want, f.name))
        assert a.dtype == b.dtype, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_gather_zero_union_and_rel_bf16(rng):
    """The production train path ships width-0 union + bf16 rel arrays
    (place_entries zero_union/rel_bf16); the store must serve the identical
    batch when built from the same pre-shaped entries."""
    es = _entries(rng, 4)
    # production pre-shape: width-0 union sentinel (zero_union upload form)
    es = [e.replace(union_feat=np.zeros(np.shape(e.union_feat)[:-1] + (0,),
                                        np.float32)) for e in es]
    store = DeviceEntryStore(rel_bf16=True)
    for i, e in enumerate(es):
        store.add(i, e)
    store.seal()
    got = store.gather([2, 0])
    want = place_entries([es[2], es[0]], rel_bf16=True)
    assert got.union_feat.dtype == want.union_feat.dtype == jnp.bfloat16
    assert got.union_feat.shape == want.union_feat.shape
    np.testing.assert_array_equal(np.asarray(got.spatial_masks, np.float32),
                                  np.asarray(want.spatial_masks, np.float32))
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))


def test_feats_bf16_rounds_like_upload_cast(rng):
    es = _entries(rng, 2)
    store = DeviceEntryStore(feats_bf16=True)
    for i, e in enumerate(es):
        store.add(i, e)
    store.seal()
    got = store.gather([0, 1])
    assert got.features.dtype == jnp.bfloat16
    want = np.stack([np.asarray(e.features) for e in es]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got.features, np.float32),
                                  want.astype(np.float32))


def test_mixed_buckets_group_and_refuse_cross_bucket_gather(rng):
    small = _entries(rng, 3, rels=8, boxes=12)
    big = _entries(rng, 3, rels=16, boxes=24)
    store = DeviceEntryStore()
    for i, e in enumerate(small + big):
        store.add(i, e)
    store.seal()
    assert store.gather([0, 2]) is not None
    assert store.gather([3, 5]) is not None
    assert store.gather([0, 3]) is None  # cross-bucket: caller streams
    assert store.gather([0, 99]) is None  # unknown video: caller streams


def test_budget_overflow_stops_adds(rng):
    es = _entries(rng, 4)
    per = DeviceEntryStore()._entry_bytes(es[0])
    store = DeviceEntryStore(budget_bytes=int(per * 2.5))
    assert store.add(0, es[0]) and store.add(1, es[1])
    assert not store.add(2, es[2])
    assert store.overflow and not store.add(3, es[3])
    store.seal()
    assert store.gather([0, 1]) is not None
    assert store.gather([0, 2]) is None


def test_add_batch_adopts_uploaded_batch(rng):
    """Cold-epoch fast path: the already-on-device batch becomes store rows
    with no re-upload; later gathers mix add_batch and add/seal rows."""
    es = _entries(rng, 6)
    store = DeviceEntryStore()
    b0 = place_entries(es[:3])
    assert store.add_batch([0, 1, 2], b0)
    b1 = place_entries(es[3:5])
    assert store.add_batch([3, 4], b1)
    store.add(5, es[5])
    store.seal()
    got = store.gather([4, 0, 5])
    want = place_entries([es[4], es[0], es[5]])
    for f in dataclasses.fields(Entry):
        np.testing.assert_array_equal(np.asarray(getattr(got, f.name)),
                                      np.asarray(getattr(want, f.name)),
                                      err_msg=f.name)


def test_add_batch_feats_bf16_casts_on_device(rng):
    es = _entries(rng, 2)
    store = DeviceEntryStore(feats_bf16=True)
    assert store.add_batch([0, 1], place_entries(es))
    got = store.gather([0, 1])
    assert got.features.dtype == jnp.bfloat16
    want = np.stack([np.asarray(e.features) for e in es]).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got.features, np.float32),
                                  want.astype(np.float32))


def test_many_chunks_tree_collapse(rng):
    """>16 appended chunks collapse through the bounded tree reduction
    without changing gather semantics."""
    es = _entries(rng, 18)
    store = DeviceEntryStore()
    for i, e in enumerate(es):
        store.add_batch([i], place_entries([e]))
    got = store.gather([17, 0, 9])
    want = place_entries([es[17], es[0], es[9]])
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(want.labels))


def test_add_batch_respects_budget(rng):
    import jax

    es = _entries(rng, 4)
    b = place_entries(es[:2])
    per = sum(l.nbytes for l in jax.tree.leaves(b))
    store = DeviceEntryStore(budget_bytes=int(per * 1.5))
    assert store.add_batch([0, 1], b)
    assert not store.add_batch([2, 3], place_entries(es[2:4]))
    assert store.overflow
    assert store.gather([0, 1]) is not None


def test_add_batch_sharded_matches_dense(rng):
    """Mesh mode: a P('data')-sharded batch is adopted shard-locally; an
    unsharded batch is refused (caller streams)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    es = _entries(rng, 8)
    mesh = _mesh(4)
    store = DeviceEntryStore(mesh=mesh)
    sh = NamedSharding(mesh, P("data"))
    b0 = jax.tree.map(lambda x: jax.device_put(x, sh), place_entries(es[:4]))
    b1 = jax.tree.map(lambda x: jax.device_put(x, sh), place_entries(es[4:]))
    assert store.add_batch([0, 1, 2, 3], b0)
    assert store.add_batch([4, 5, 6, 7], b1)
    # position-block shard layout: [0,4,1,5,2,6,3,7] is the balanced order
    batches, misses = store.plan_batches(list(range(8)), 8)
    assert len(batches) == 1 and not misses
    got = store.gather(batches[0])
    want = place_entries([es[i] for i in batches[0]])
    for f in dataclasses.fields(Entry):
        np.testing.assert_array_equal(np.asarray(getattr(got, f.name)),
                                      np.asarray(getattr(want, f.name)),
                                      err_msg=f.name)
    # unsharded batch: refused, nothing recorded
    store2 = DeviceEntryStore(mesh=mesh)
    assert not store2.add_batch([0, 1, 2, 3], place_entries(es[:4]))
    assert store2.gather([0, 1, 2, 3]) is None


def test_sharded_mixed_add_paths_stay_balanced(rng):
    """add_batch bumps add()'s round-robin cursor: mixing the two fill
    paths on one bucket keeps shards balanced and gathers exact."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    es = _entries(rng, 12)
    mesh = _mesh(4)
    store = DeviceEntryStore(mesh=mesh)
    sh = NamedSharding(mesh, P("data"))
    b0 = jax.tree.map(lambda x: jax.device_put(x, sh), place_entries(es[:4]))
    assert store.add_batch([0, 1, 2, 3], b0)
    for i in range(4, 12):
        assert store.add(i, es[i])
    store.seal()
    batches, misses = store.plan_batches(list(range(12)), 4)
    assert len(batches) == 3 and not misses  # balanced: every video lands
    for b in batches:
        got = store.gather(b)
        want = place_entries([es[i] for i in b])
        np.testing.assert_array_equal(np.asarray(got.features),
                                      np.asarray(want.features))
        np.testing.assert_array_equal(np.asarray(got.boxes),
                                      np.asarray(want.boxes))


def _mesh(data, model=1):
    import jax

    from nl_vsgg_tpu.parallel.mesh import make_mesh
    return make_mesh(data=data, model=model,
                     devices=jax.devices()[:data * model])


def test_sharded_gather_matches_place_entries(rng):
    """Mesh mode: shard-balanced plan, device-local gather, P('data')
    output sharding, values identical to place_entries over the same
    videos — across two incremental seals."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    es = _entries(rng, 11)
    mesh = _mesh(4)
    store = DeviceEntryStore(mesh=mesh)
    for i, e in enumerate(es[:6]):
        assert store.add(i, e)
    store.seal()
    for i, e in enumerate(es[6:], start=6):
        assert store.add(i, e)
    store.seal()

    batches, misses = store.plan_batches(list(range(11)), 8)
    assert len(batches) == 1 and len(batches[0]) == 8
    assert sorted(batches[0] + misses) == list(range(11))
    got = store.gather(batches[0])
    assert got is not None
    assert got.features.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), got.features.ndim)
    want = place_entries([es[i] for i in batches[0]])
    for f in dataclasses.fields(Entry):
        a = np.asarray(getattr(got, f.name))
        b = np.asarray(getattr(want, f.name))
        assert a.dtype == b.dtype, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)
    # round-robin shard assignment: [0..7] is NOT shard-grouped -> stream
    assert store.gather(list(range(8))) is None
    # batch not a multiple of the data axis -> stream
    assert store.gather(batches[0][:6]) is None


def test_sharded_store_with_model_axis(rng):
    """data=4 x model=2: shards replicate across the model column and the
    gathered batch matches the dense path bit-for-bit."""
    es = _entries(rng, 8)
    store = DeviceEntryStore(mesh=_mesh(4, model=2), rel_bf16=True)
    for i, e in enumerate(es):
        store.add(i, e)
    store.seal()
    batches, misses = store.plan_batches(list(range(8)), 8)
    assert len(batches) == 1 and not misses
    got = store.gather(batches[0])
    want = place_entries([es[i] for i in batches[0]], rel_bf16=True)
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))
    np.testing.assert_array_equal(
        np.asarray(got.union_feat, np.float32),
        np.asarray(want.union_feat, np.float32))
    np.testing.assert_array_equal(np.asarray(got.num_frames),
                                  np.asarray(want.num_frames))


def test_sharded_plan_rejects_indivisible_batch(rng):
    es = _entries(rng, 4)
    store = DeviceEntryStore(mesh=_mesh(4))
    for i, e in enumerate(es):
        store.add(i, e)
    store.seal()
    batches, misses = store.plan_batches([0, 1, 2, 3], 3)
    assert not batches and misses == [0, 1, 2, 3]


def test_sharded_gathered_batch_feeds_sharded_step(rng):
    """The gathered batch IS the train step's input: a jitted vmap-apply
    under the mesh consumes it directly (the sharding the train CLI's
    place_batch would otherwise have to install)."""
    import jax

    es = _entries(rng, 8)
    mesh = _mesh(4)
    store = DeviceEntryStore(mesh=mesh)
    for i, e in enumerate(es):
        store.add(i, e)
    store.seal()
    batch = store.gather(store.plan_batches(list(range(8)), 8)[0][0])
    out = jax.jit(jax.vmap(lambda e: e.features.sum() +
                           e.pair_idx.sum()))(batch)
    assert np.isfinite(np.asarray(out)).all()


def test_incremental_seal_appends(rng):
    """seal() may be called per batch while the cold epoch streams; rows
    added after a seal land in the same bucket store with correct mapping."""
    es = _entries(rng, 5)
    store = DeviceEntryStore()
    for i in (0, 1):
        store.add(i, es[i])
    store.seal()
    for i in (2, 3, 4):
        store.add(i, es[i])
    store.seal()
    got = store.gather([3, 0, 4])
    want = place_entries([es[3], es[0], es[4]])
    np.testing.assert_array_equal(np.asarray(got.features),
                                  np.asarray(want.features))
    np.testing.assert_array_equal(np.asarray(got.pair_idx),
                                  np.asarray(want.pair_idx))
