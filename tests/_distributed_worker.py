"""Subprocess worker for tests/test_distributed.py.

Runs one process of an N-process jax.distributed job on the CPU backend
(Gloo collectives over localhost) and writes its result as JSON. Modes:

  gather <out.json>  — allgather_obj + merge_evaluators round-trip
  train <out.json>   — DistributedBatcher + the real train step over a
                       4-device global mesh; prints losses + param digest
                       (compared against a single-process 4-device run of
                       the same harness — the SPMD program is identical, so
                       results must match to float tolerance)

Process topology comes from NL_VSGG_COORDINATOR / NL_VSGG_NUM_PROCESSES /
NL_VSGG_PROCESS_ID (the same env contract tools/train_STTran.py uses) and
XLA_FLAGS --xla_force_host_platform_device_count for local device count.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if not os.environ.get("NL_VSGG_NO_JAX_CACHE"):
    _cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            os.path.expanduser("~/.cache/nl_vsgg_jax"))
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from nl_vsgg_tpu.parallel.distributed import (DistributedBatcher,  # noqa: E402
                                              allgather_obj, init_distributed,
                                              merge_evaluators)


def mode_gather(out_path: str) -> None:
    pid = jax.process_index()
    objs = allgather_obj({"pid": pid, "payload": list(range(pid + 1))})

    # merge_evaluators: each process scores a disjoint fake shard
    from nl_vsgg_tpu.eval import SceneGraphEvaluator
    ev = SceneGraphEvaluator(mode="sgdet")
    for k in ev.recall:
        ev.recall[k] = [0.25 * (pid + 1)] * 2
        ev.recall_nogc[k] = [0.5 * (pid + 1)]
        ev.semi_recall[k] = [0.125]
    ev.mean_recall.collect[20][3] = [1.0 * (pid + 1)]
    merge_evaluators(ev)
    json.dump({
        "pid": pid,
        "nproc": jax.process_count(),
        "gathered": objs,
        "recall20": ev.recall[20],
        "nogc20": ev.recall_nogc[20],
        "mr_collect": ev.mean_recall.collect[20][3],
        "mean_r20": ev.mean_score(20),
    }, open(out_path, "w"))


def _entries():
    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    es = []
    for i in range(4):
        r = np.random.default_rng(100 + i)
        # two different buckets to exercise the cross-process bucket agreement
        bb = 16 if i % 2 == 0 else 32
        es.append(make_synthetic_entry(r, n_frames=3, objs_per_frame=2,
                                       bucket_boxes=bb, bucket_rels=bb,
                                       feat_dim=32))
    return es


def mode_train(out_path: str) -> None:
    import jax.numpy as jnp
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.parallel.mesh import make_mesh, shard_state
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

    entries = _entries()
    # slot 3 fails grounding: it must become an inert zero slot everywhere
    ground = lambda i: None if i == 3 else entries[i]

    # NL_VSGG_TEST_MODEL_PAR=2 exercises wide-kernel model sharding across
    # process boundaries on top of the data-parallel batch
    model_par = int(os.environ.get("NL_VSGG_TEST_MODEL_PAR", "1"))
    mesh = make_mesh(data=jax.device_count() // model_par, model=model_par)
    model = STTran(mode="sgdet", feat_dim=32, enc_layer_num=1, dec_layer_num=1)
    tx = make_optimizer(lr=1e-3)
    state, tx = create_train_state(model, entries[0], jax.random.key(0), tx=tx)
    state = shard_state(mesh, state)
    step = jax.jit(make_train_step(model, tx, bce=True))

    batcher = DistributedBatcher(ground, [0, 1, 2, 3], 4, mesh, feat_dim=32)
    losses = []
    for t, batch in enumerate(batcher):
        state, m = step(state, batch, jax.random.key(7 + t))
        losses.append(float(m["total"]))

    digest = float(jax.jit(lambda p: jax.tree.reduce(
        lambda a, x: a + jnp.abs(x.astype(jnp.float32)).sum(), p,
        jnp.zeros(())))(state.params))
    json.dump({"pid": jax.process_index(), "nproc": jax.process_count(),
               "losses": losses, "digest": digest}, open(out_path, "w"))


def mode_store(out_path: str) -> None:
    """Multi-controller device entry store: cold adoption of the batcher's
    global batches (add_batch), identical shard-balanced plan on every
    process, warm SPMD gathers whose values equal the host-side expectation
    — and a real train step consuming a gathered batch."""
    import jax.numpy as jnp

    from nl_vsgg_tpu.data.device_store import DeviceEntryStore
    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.parallel.mesh import make_mesh, shard_state
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step)

    # two buckets (16 for videos 0-3, 32 for 4-7): the batcher agrees a
    # different padded shape per cold batch, so the store's cross-process
    # bookkeeping must track per-bucket shard rows
    es = [make_synthetic_entry(np.random.default_rng(200 + i), n_frames=3,
                               objs_per_frame=2,
                               bucket_boxes=16 if i < 4 else 32,
                               bucket_rels=16 if i < 4 else 32,
                               feat_dim=32) for i in range(8)]
    ground = lambda i: None if i == 5 else es[i]  # one failed slot
    mesh = make_mesh(data=jax.device_count(), model=1)
    store = DeviceEntryStore(mesh=mesh)
    batcher = DistributedBatcher(ground, list(range(8)), 4, mesh, feat_dim=32,
                                 yield_indices=True)
    for chunk, b in batcher:
        assert store.add_batch(chunk, b), chunk

    order = [6, 1, 4, 3, 0, 7, 5, 2]  # same warm shuffle on every process
    batches, misses = store.plan_batches(order, 4)
    assert not misses and len(batches) == 2, (batches, misses)
    for idxs in batches:  # plan never mixes buckets inside one batch
        assert len({i < 4 for i in idxs}) == 1, batches

    digest_fn = jax.jit(lambda e: sum(
        jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(e)))

    def host_digest(idxs):
        tot = 0.0
        for i in idxs:
            if ground(i) is None:
                continue  # adopted as an inert zero slot
            tot += sum(float(np.asarray(x, np.float64).sum())
                       for x in jax.tree.leaves(es[i]))
        return tot

    digests, expected = [], []
    gathered = []
    for idxs in batches:
        g = store.gather(idxs)
        assert g is not None, idxs
        gathered.append(g)
        digests.append(float(digest_fn(g)))  # replicated scalar: fetchable
        expected.append(host_digest(idxs))
    np.testing.assert_allclose(digests, expected, rtol=1e-4)

    model = STTran(mode="sgdet", feat_dim=32, enc_layer_num=1, dec_layer_num=1)
    tx = make_optimizer(lr=1e-3)
    state, tx = create_train_state(model, es[0], jax.random.key(0), tx=tx)
    state = shard_state(mesh, state)
    step = jax.jit(make_train_step(model, tx, bce=True))
    state, m = step(state, gathered[0], jax.random.key(11))
    loss = float(m["total"])
    assert np.isfinite(loss)
    json.dump({"pid": jax.process_index(), "nproc": jax.process_count(),
               "plan": batches, "digests": digests, "loss": loss},
              open(out_path, "w"))


def main():
    init_distributed()
    mode, out_path = sys.argv[1], sys.argv[2]
    {"gather": mode_gather, "train": mode_train,
     "store": mode_store}[mode](out_path)


if __name__ == "__main__":
    main()
