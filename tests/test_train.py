"""Train-layer tests: loss parity vs torch formulas, step mechanics, NaN
guard, and the data+model-parallel step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
from nl_vsgg_tpu.models import losses as L
from nl_vsgg_tpu.models.sttran import STTran
from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                               make_train_step, stack_entries)

torch = pytest.importorskip("torch")

FEAT = 64


def _entry(rng, frames=5, objs=2, bb=24, br=16):
    return make_synthetic_entry(rng, n_frames=frames, objs_per_frame=objs,
                                bucket_boxes=bb, bucket_rels=br, feat_dim=FEAT)


class TestLossParity:
    """Masked losses == reference loop math (tools/train_STTran.py:148-186)
    computed with torch on the valid rows."""

    def _fake_pred(self, rng, entry):
        R = entry.n_rels
        N = entry.n_boxes
        return {
            "distribution": jnp.asarray(rng.standard_normal((N, 37)), jnp.float32),
            "attention_distribution": jnp.asarray(rng.standard_normal((R, 3)), jnp.float32),
            "spatial_logits": jnp.asarray(rng.standard_normal((R, 6)), jnp.float32),
            "contacting_logits": jnp.asarray(rng.standard_normal((R, 17)), jnp.float32),
        }

    def test_bce_losses_match_torch(self, rng):
        entry = _entry(rng)
        pred = self._fake_pred(rng, entry)
        out = L.sttran_losses(pred, entry, jax.random.key(0), bce=True)

        bm = np.asarray(entry.box_mask)
        rm = np.asarray(entry.rel_mask)
        tt = lambda a: torch.as_tensor(np.asarray(a))

        obj = torch.nn.functional.cross_entropy(
            tt(pred["distribution"])[bm], tt(entry.labels)[bm].long())
        np.testing.assert_allclose(out["object_loss"], obj.numpy(), rtol=1e-5)

        # attention: synthetic GT has exactly one positive per valid rel, so
        # the sampled label is deterministic
        att_rows = rm & (np.asarray(entry.attention_gt).sum(-1) > 0)
        att_label = np.asarray(entry.attention_gt).argmax(-1)[att_rows]
        att = torch.nn.functional.cross_entropy(
            tt(pred["attention_distribution"])[att_rows], torch.as_tensor(att_label).long())
        np.testing.assert_allclose(out["attention_relation_loss"], att.numpy(), rtol=1e-5)

        for key, logits, gt, C in [("spatial_relation_loss", pred["spatial_logits"],
                                    entry.spatial_gt, 6),
                                   ("contact_relation_loss", pred["contacting_logits"],
                                    entry.contacting_gt, 17)]:
            rows = rm & (np.asarray(gt).sum(-1) > 0)
            ref = torch.nn.functional.binary_cross_entropy(
                torch.sigmoid(tt(logits)[rows]), tt(gt)[rows])
            np.testing.assert_allclose(out[key], ref.numpy(), rtol=1e-5)

    def test_mlm_matches_torch(self, rng):
        entry = _entry(rng)
        # force one valid row whose ONLY spatial GT is predicate 0: the
        # reference's margin-mode mask `(index_labels > 0).sum() != 0`
        # (tools/train_STTran.py:171) EXCLUDES it (its -1-padded label row
        # [0, -1, ...] has no positive entry), unlike BCE mode
        sg = np.asarray(entry.spatial_gt)
        first_valid = int(np.where(np.asarray(entry.rel_mask))[0][0])
        sg[first_valid] = 0.0
        sg[first_valid, 0] = 1.0
        pred = self._fake_pred(rng, entry)
        out = L.sttran_losses(pred, entry, jax.random.key(0), bce=False)
        rm = np.asarray(entry.rel_mask)
        rows = rm & (np.asarray(entry.spatial_gt)[:, 1:].sum(-1) > 0)
        assert not rows[first_valid]
        # torch MultiLabelMarginLoss wants index-list labels padded with -1
        gt = np.asarray(entry.spatial_gt)[rows]
        labels = -np.ones_like(gt, dtype=np.int64)
        for i, row in enumerate(gt):
            idx = np.where(row > 0)[0]
            labels[i, :len(idx)] = idx
        ref = torch.nn.MultiLabelMarginLoss()(
            torch.as_tensor(np.asarray(pred["spatial_logits"])[rows]),
            torch.as_tensor(labels))
        np.testing.assert_allclose(out["spatial_relation_loss"], ref.numpy(), rtol=1e-5)

    def test_attention_sampling_uniform_among_positives(self):
        mh = jnp.asarray([[1.0, 0.0, 1.0]])
        draws = np.array([int(L.sample_multi_hot(jax.random.key(i), mh)[0])
                          for i in range(64)])
        assert set(draws.tolist()) == {0, 2}

    def test_padding_rows_do_not_contribute(self, rng):
        entry = _entry(rng, bb=24, br=16)
        pred = self._fake_pred(rng, entry)
        out1 = L.sttran_losses(pred, entry, jax.random.key(0))
        # poison the padding rows of the predictions
        poisoned = {k: np.asarray(v).copy() for k, v in pred.items()}
        poisoned["distribution"][~np.asarray(entry.box_mask)] = 1e6
        for k in ("attention_distribution", "spatial_logits", "contacting_logits"):
            poisoned[k][~np.asarray(entry.rel_mask)] = 1e6
        out2 = L.sttran_losses({k: jnp.asarray(v) for k, v in poisoned.items()},
                               entry, jax.random.key(0))
        for k in out1:
            np.testing.assert_allclose(out1[k], out2[k], rtol=1e-6)


class TestTrainStep:
    def _setup(self, rng, batch=2, lr=1e-4):
        entries = [_entry(rng) for _ in range(batch)]
        # dec_layer_num=1: step mechanics don't depend on depth, and CPU
        # compiles of the 3-layer decoder dominate suite time
        model = STTran(mode="sgdet", feat_dim=FEAT, dec_layer_num=1)
        tx = make_optimizer(lr=lr)
        state, tx = create_train_state(model, entries[0], jax.random.key(0), tx=tx)
        step = jax.jit(make_train_step(model, tx))
        return state, step, stack_entries([jax.tree.map(jnp.asarray, e) for e in entries])

    def test_loss_decreases(self, rng):
        # object CE is the stable component (Adam's first steps overshoot the
        # tiny 3-way attention head by design; the reference trains at 1e-5)
        state, step, batch = self._setup(rng)
        first = None
        for i in range(10):
            state, m = step(state, batch, jax.random.key(i))
            if first is None:
                first = float(m["object_loss"])
        assert float(m["object_loss"]) < first
        assert np.isfinite(float(m["total"]))
        assert int(state.skipped) == 0
        assert int(state.step) == 10

    def test_empty_video_skipped(self, rng):
        state, step, batch = self._setup(rng)
        p0 = state.params
        empty = jax.tree.map(jnp.zeros_like, batch)
        state, m = step(state, empty, jax.random.key(0))
        assert int(state.skipped) == 1
        assert float(m["valid"]) == 0.0
        # params untouched (lib/utils.py NaN/empty guard semantics)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, state.params)

    def test_padded_videos_do_not_dilute(self, rng):
        """A batch zero-padded along the video axis (place_batch mesh fill)
        must step to exactly the same params/batch_stats as the unpadded
        batch: the loss mean and BN-stat mean are weighted by per-video
        validity. (jax.random.split(k, n)[i] is independent of n, so video 0
        draws identical dropout keys in both runs.)"""
        from nl_vsgg_tpu.data.entry import empty_entry

        import optax

        e = _entry(rng)
        model = STTran(mode="sgdet", feat_dim=FEAT, dec_layer_num=1)
        # SGD, not AdamW: Adam's m/sqrt(v) amplifies float32 reduction-order
        # noise on near-zero grads into ~1e-4 param diffs between the B=1 and
        # B=2 compiled programs; with SGD the param diff is lr * grad diff,
        # while actual dilution would still show as an O(lr) error
        tx = optax.sgd(1e-3)
        state, tx = create_train_state(model, e, jax.random.key(0), tx=tx)
        step = jax.jit(make_train_step(model, tx))

        pad = empty_entry(e.n_boxes, e.n_rels, feat_dim=FEAT)
        real = stack_entries([jax.tree.map(jnp.asarray, e)])
        padded = stack_entries([jax.tree.map(jnp.asarray, x) for x in (e, pad)])
        s1, m1 = step(state, real, jax.random.key(7))
        s2, m2 = step(state, padded, jax.random.key(7))
        assert float(m2["valid"]) == 1.0
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)
        # rtol+atol 1e-5: XLA fuses the B=1 and B=2 reductions differently,
        # leaving float32 reduction-order noise (dilution would be O(lr))
        close = lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        jax.tree.map(close, s1.params, s2.params)
        jax.tree.map(close, s1.batch_stats, s2.batch_stats)

    def test_multichip_data_model_parallel(self, rng):
        from nl_vsgg_tpu.parallel import batch_sharding, make_mesh, param_shardings, replicated
        assert len(jax.devices()) == 8
        mesh = make_mesh(data=4, model=2)

        entries = [_entry(rng) for _ in range(8)]
        model = STTran(mode="sgdet", feat_dim=FEAT, dec_layer_num=1)
        tx = make_optimizer(lr=1e-3)
        state, tx = create_train_state(model, entries[0], jax.random.key(0), tx=tx)
        rep = replicated(mesh)
        state = state.replace(
            params=jax.tree.map(jax.device_put, state.params,
                                param_shardings(mesh, state.params)),
            batch_stats=jax.tree.map(lambda x: jax.device_put(x, rep), state.batch_stats),
            opt_state=jax.tree.map(lambda x: jax.device_put(x, rep)
                                   if hasattr(x, "shape") else x, state.opt_state),
            step=jax.device_put(state.step, rep),
            skipped=jax.device_put(state.skipped, rep),
        )
        batch = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), batch_sharding(mesh)),
                             stack_entries(entries))
        step = jax.jit(make_train_step(model, tx))
        with mesh:
            state, m = step(state, batch, jax.random.key(0))
        assert np.isfinite(float(m["total"]))
        assert int(state.step) == 1


def test_remat_matches_dense():
    """cfg.remat (jax.checkpoint on the temporal stack) must not change the
    math — same params give identical outputs and matching grads."""
    import jax
    import jax.numpy as jnp

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.losses import sttran_losses
    from nl_vsgg_tpu.models.sttran import STTran

    rng = np.random.default_rng(7)
    entry = jax.tree.map(jnp.asarray, make_synthetic_entry(
        rng, n_frames=4, bucket_boxes=24, bucket_rels=16, feat_dim=32))
    dense = STTran(mode="sgdet", feat_dim=32, dec_layer_num=2)
    remat = STTran(mode="sgdet", feat_dim=32, dec_layer_num=2, remat=True)
    variables = dense.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, entry, train=False)
    # identical param tree (remat must not rename scopes)
    assert (jax.tree_util.tree_structure(
        remat.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   entry, train=False))
        == jax.tree_util.tree_structure(variables))

    out_d = dense.apply(variables, entry, train=False)
    out_r = remat.apply(variables, entry, train=False)
    # remat regions compile with different fusion boundaries -> ULP-level
    # drift, not semantic difference
    np.testing.assert_allclose(np.asarray(out_r["global_output"]),
                               np.asarray(out_d["global_output"]),
                               rtol=1e-4, atol=1e-5)

    def loss(m, params):
        pred = m.apply({"params": params, "batch_stats": variables["batch_stats"]},
                       entry, train=False)
        return sttran_losses(pred, entry, jax.random.key(2), bce=True)["total"]

    g_d = jax.grad(lambda p: loss(dense, p))(variables["params"])
    g_r = jax.grad(lambda p: loss(remat, p))(variables["params"])
    for pd, pr in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pd),
                                   rtol=1e-3, atol=1e-4)


def test_place_entries_zero_union_is_equivalent():
    """zero_union ships a width-0 union_feat; every other leaf must be
    byte-identical to the plain upload, and the models must produce EXACTLY
    the outputs and gradients of explicit all-zero union features (the
    union_projection bias-broadcast fast path, models/sttran.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.dsg_detr import DSGDETR
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import place_entries, stack_entries

    rng = np.random.default_rng(11)
    entries = [make_synthetic_entry(rng, n_frames=3, bucket_boxes=16,
                                    bucket_rels=8, feat_dim=16)
               for _ in range(2)]
    for e in entries:
        e.union_feat[:] = 0.0
    ref = stack_entries([jax.tree.map(jnp.asarray, e) for e in entries])
    got = place_entries(entries, zero_union=True)
    assert got.union_feat.shape == ref.union_feat.shape[:-1] + (0,)
    for f in dataclasses.fields(ref):
        if f.name == "union_feat":
            continue
        np.testing.assert_array_equal(np.asarray(getattr(ref, f.name)),
                                      np.asarray(getattr(got, f.name)))

    for model in (STTran(mode="sgdet", feat_dim=16),
                  DSGDETR(mode="sgdet", feat_dim=16)):
        one_ref = jax.tree.map(lambda x: x[0], ref)
        one_got = jax.tree.map(lambda x: x[0], got)
        v = model.init({"params": jax.random.key(0),
                        "dropout": jax.random.key(1)}, one_ref, train=False)

        def fwd_sum(params, e):
            out = model.apply({"params": params,
                               "batch_stats": v.get("batch_stats", {})},
                              e, train=False)
            return (out["attention_distribution"].sum()
                    + out["spatial_logits"].sum()
                    + out["contacting_logits"].sum()), out

        (s_ref, o_ref), g_ref = jax.value_and_grad(fwd_sum, has_aux=True)(
            v["params"], one_ref)
        (s_got, o_got), g_got = jax.value_and_grad(fwd_sum, has_aux=True)(
            v["params"], one_got)
        for k in ("attention_distribution", "spatial_logits",
                  "contacting_logits", "global_output"):
            np.testing.assert_array_equal(np.asarray(o_ref[k]),
                                          np.asarray(o_got[k]))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_place_entries_rel_bf16_matches_model_cast():
    """Pre-casting union_feat/spatial_masks to bf16 at batch build must give
    bit-identical bf16-model outputs to uploading fp32 (the model casts
    those two arrays itself; features must stay fp32 — the object
    classifier consumes them in full precision)."""
    import jax
    import jax.numpy as jnp

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import place_entries

    rng = np.random.default_rng(12)
    entries = [make_synthetic_entry(rng, n_frames=3, bucket_boxes=16,
                                    bucket_rels=8, feat_dim=32)
               for _ in range(2)]
    full = place_entries(entries)
    cast = place_entries(entries, rel_bf16=True)
    assert cast.union_feat.dtype == jnp.bfloat16
    assert cast.spatial_masks.dtype == jnp.bfloat16
    assert cast.features.dtype == jnp.float32

    model = STTran(mode="sgdet", feat_dim=32, dtype=jnp.bfloat16)
    one = jax.tree.map(lambda x: x[0], full)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, one, train=False)

    def fwd(b):
        return jax.vmap(lambda e: model.apply(variables, e, train=False))(b)

    out_full, out_cast = fwd(full), fwd(cast)
    for k in out_full:
        np.testing.assert_array_equal(np.asarray(out_full[k]),
                                      np.asarray(out_cast[k]), err_msg=k)


def test_decoder_dup2_matches_plain_path():
    """The first temporal-decoder layer's dup2 fast path (q/k/v projections
    computed once per relation + broadcast-added slot-embedding projection,
    models/layers.py::MaskedMHA dup2_pos) must equal the plain duplicated-
    stream call bit-for-bit up to matmul reassociation."""
    import jax
    import jax.numpy as jnp

    from nl_vsgg_tpu.models.layers import MaskedDecoderLayer

    R, E, F = 24, 32, 5
    rng = np.random.default_rng(3)
    local = jnp.asarray(rng.standard_normal((R, E)).astype(np.float32))
    im_idx = jnp.asarray(np.sort(rng.integers(0, F, R)).astype(np.int32))
    rel_mask = jnp.asarray(rng.uniform(size=R) > 0.25)
    pe = jnp.asarray(rng.standard_normal((2, E)).astype(np.float32))
    num_frames = jnp.asarray(F)

    window = jnp.concatenate([im_idx, im_idx - 1])
    slot = jnp.concatenate([jnp.zeros_like(im_idx), jnp.ones_like(im_idx)])
    valid = jnp.concatenate([rel_mask & (im_idx <= num_frames - 2),
                             rel_mask & (im_idx >= 1)])
    allow = (window[:, None] == window[None, :]) \
        & valid[:, None] & valid[None, :]

    layer = MaskedDecoderLayer(E, 4, 64, 0.1)
    x2 = jnp.concatenate([local, local], axis=-2)
    params = layer.init(jax.random.key(0), x2, pe[slot], allow, True)
    out_plain = layer.apply(params, x2, pe[slot], allow, True)
    out_dup2 = layer.apply(params, local, pe, allow, True, None, None, True)
    np.testing.assert_allclose(np.asarray(out_dup2), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-5)


def test_checkpoint_meta_and_scheduler_roundtrip(tmp_path):
    """The plateau scheduler's host-side state persists via the checkpoint
    meta sidecar — without it a resume resets the decayed lr to cfg.lr at
    its first epoch end."""
    import jax

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import create_train_state, make_optimizer
    from nl_vsgg_tpu.train.state import PlateauScheduler
    from nl_vsgg_tpu.utils.checkpoint import (load_meta, latest_step,
                                              restore_checkpoint,
                                              save_checkpoint)

    sched = PlateauScheduler(1e-5)
    for score in (0.5, 0.4, 0.3, 0.2):  # two bad epochs past patience
        lr = sched.step(score)
    assert lr < 1e-5  # decayed

    rng = np.random.default_rng(0)
    e = make_synthetic_entry(rng, n_frames=2, bucket_boxes=8, bucket_rels=6,
                             feat_dim=16)
    model = STTran(mode="sgdet", feat_dim=16, dec_layer_num=1)
    state, _ = create_train_state(model, e, jax.random.key(0),
                                  tx=make_optimizer(1e-5))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 3, state, extra={"scheduler": sched.state_dict()})
    assert latest_step(d) == 3
    meta = load_meta(d)
    sched2 = PlateauScheduler(1e-5)
    sched2.load_state_dict(meta["scheduler"])
    assert sched2.lr == sched.lr and sched2.best == sched.best \
        and sched2.num_bad == sched.num_bad
    restore_checkpoint(d, state)  # state restore still works with the sidecar
    # pre-sidecar checkpoints: meta is simply absent
    save_checkpoint(d, 4, state)
    assert load_meta(d, 4) is None
