"""Probe: op-level time attribution for the b64/bf16 train step (scratch).

Captures an XProf trace of a few train steps on the real chip, then parses
the xplane with the xprof/tensorboard-plugin-profile converter and prints
the top HLO ops by self time. This is the measurement behind the
train-step-MFU work (ROADMAP item 4): the gap between inference (~72% MFU)
and training (~39%) has to be attributed before building anything.

Usage: python tools/probe_trace.py [--steps N] [--b B] [--fp32]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_xplane(logdir: str, top: int = 30):
    """Print top device ops by self-time (framework_op_stats table)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    if isinstance(data, str):
        data = json.loads(data)
    table = data[0] if isinstance(data, list) else data
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        d = dict(zip(cols, [c.get("v") for c in r["c"]]))
        if d.get("host_or_device") != "Device":
            continue
        rows.append(d)
    rows.sort(key=lambda d: -(d.get("total_self_time") or 0.0))
    total = sum(d.get("total_self_time") or 0.0 for d in rows)
    print(f"{'us/occ':>10} {'pct':>6} {'cum%':>6} {'bound':>8}  op")
    cum = 0.0
    for d in rows[:top]:
        t = d.get("total_self_time") or 0.0
        cum += t
        name = (d.get("operation") or "?")
        if len(name) > 100:
            name = name[:97] + "..."
        print(f"{d.get('avg_self_time') or 0:10.1f} {100 * t / total:6.2f} "
              f"{100 * cum / total:6.2f} {str(d.get('bound_by')):>8}  {name}")
    print(f"# total device self-time: {total / 1e3:.2f} ms "
          f"across {len(rows)} ops")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--b", type=int, default=64)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--eval", action="store_true",
                   help="trace the inference forward (the bench headline) "
                        "instead of the train step. NB each call ends in a "
                        "host fetch, so IDLE reflects the tunnel round trip "
                        "between calls — read op SHARES of non-IDLE time "
                        "(the bench's chained fori_loop has no such gaps)")
    p.add_argument("--detector", action="store_true",
                   help="trace the VinVL-JAX detect_batch (8f x 608x1024, "
                        "bench_suite's detector row shapes) instead of the "
                        "train step — the attribution behind any detector "
                        "kernel work (is it MXU- or HBM-bound, and where)")
    p.add_argument("--logdir", default=None)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--parse_only", default=None,
                   help="skip capture; parse this existing logdir")
    args = p.parse_args()

    if args.parse_only:
        parse_xplane(args.parse_only, args.top)
        return

    import jax
    import jax.numpy as jnp

    if args.detector:
        from jax import lax

        from nl_vsgg_tpu.detector.anchors import grid_anchors
        from nl_vsgg_tpu.detector.attr_rcnn import AttrRCNNJax

        print(f"# device: {jax.devices()[0].device_kind}", flush=True)
        F, H, W = 8, 608, 1024
        det = AttrRCNNJax.create(
            compute_dtype=None if args.fp32 else "bfloat16")
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.standard_normal((F, H, W, 3)).astype(np.float32))
        anchors = jnp.asarray(grid_anchors(H // 16, W // 16))
        im_hw = jnp.asarray([600.0, 1013.0], jnp.float32)
        inner = det._detect_batch

        @jax.jit
        def chained(v, imgs, n):
            def body(i, c):
                out = inner(v, imgs + c * 1e-30, anchors, im_hw)
                return c + jnp.sum(out) * 1e-30
            return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        float(chained(det.variables, imgs, 1))  # compile outside the trace
        logdir = args.logdir or tempfile.mkdtemp(prefix="nlvsgg_trace_")
        print(f"# tracing {args.steps} chained detect_batch calls -> {logdir}",
              flush=True)
        with jax.profiler.trace(logdir):
            float(chained(det.variables, imgs, args.steps))
        parse_xplane(logdir, args.top)
        print(f"# logdir kept: {logdir}")
        return

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step, stack_entries)

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    entries = [make_synthetic_entry(rng, n_frames=32, objs_per_frame=3,
                                    bucket_boxes=128, bucket_rels=96,
                                    feat_dim=2048) for _ in range(args.b)]
    batch = jax.tree.map(jnp.asarray, stack_entries(entries))
    model = STTran(mode="sgdet", feat_dim=2048,
                   dtype=None if args.fp32 else jnp.bfloat16)
    tx = make_optimizer(lr=1e-5)
    state, tx = create_train_state(model, entries[0], jax.random.key(0), tx=tx)
    key = jax.random.key(1, impl="rbg")

    if args.eval:
        if not args.fp32:
            batch = batch.replace(
                union_feat=batch.union_feat.astype(jnp.bfloat16),
                spatial_masks=batch.spatial_masks.astype(jnp.bfloat16))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def fwd(v, b):
            out = jax.vmap(lambda e: model.apply(v, e, train=False))(b)
            return (jnp.sum(out["attention_distribution"])
                    + jnp.sum(out["spatial_logits"])
                    + jnp.sum(out["contacting_logits"])
                    + jnp.sum(out["distribution"]))

        float(fwd(variables, batch))  # compile outside the trace
        logdir = args.logdir or tempfile.mkdtemp(prefix="nlvsgg_trace_")
        print(f"# tracing {args.steps} inference calls -> {logdir}", flush=True)
        with jax.profiler.trace(logdir):
            acc = 0.0
            for _ in range(args.steps):
                acc += float(fwd(variables, batch))  # fetch = completion
        parse_xplane(logdir, args.top)
        print(f"# logdir kept: {logdir}")
        return

    step = jax.jit(make_train_step(model, tx, bce=True))

    # compile + settle outside the trace
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)

    logdir = args.logdir or tempfile.mkdtemp(prefix="nlvsgg_trace_")
    print(f"# tracing {args.steps} steps -> {logdir}", flush=True)
    with jax.profiler.trace(logdir):
        for i in range(args.steps):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        # force completion inside the trace window; fetch depends on params
        float(jax.tree.leaves(state.params)[0].sum())
    parse_xplane(logdir, args.top)
    print(f"# logdir kept: {logdir}")


if __name__ == "__main__":
    main()
