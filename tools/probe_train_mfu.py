"""Probe battery: where does the train step's MFU go? (scratch tool)

Measures ms/step + implied TFLOP/s for a grid of variants on the real chip,
with the forced-synchronization discipline from bench.py (chained fori_loop,
dependent scalar fetch, peak-TFLOPs tripwire).

Usage: python tools/probe_train_mfu.py [--iters N] [--only NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--only", default=None,
                   help="comma-separated row names (A/B in one process)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step, stack_entries)
    from nl_vsgg_tpu.models.losses import sttran_losses
    from tools.bench_suite import check_physical, timed_delta

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    FEAT, F = 2048, 32
    rng = np.random.default_rng(0)

    def make_batch(B, dtype=None):
        entries = [make_synthetic_entry(rng, n_frames=F, objs_per_frame=3,
                                        bucket_boxes=128, bucket_rels=96,
                                        feat_dim=FEAT) for _ in range(B)]
        batch = jax.tree.map(jnp.asarray, stack_entries(entries))
        if dtype is not None:  # production path: rel arrays pre-cast (exact)
            batch = batch.replace(
                union_feat=batch.union_feat.astype(dtype),
                spatial_masks=batch.spatial_masks.astype(dtype))
        return batch, entries[0]

    key1 = jax.random.key(1, impl="rbg")

    def bench_step(name, B, dtype=None, remat=False, kind="full",
                   fused=False):
        if args.only and name not in args.only.split(","):
            return
        batch, one = make_batch(B, dtype)
        model = STTran(mode="sgdet", feat_dim=FEAT, dtype=dtype, remat=remat,
                       fused=fused)
        tx = make_optimizer(lr=1e-5)
        state, tx = create_train_state(model, one, jax.random.key(0), tx=tx)

        if kind == "full":
            step = make_train_step(model, tx, bce=True)

            def make_chained(n):
                @jax.jit
                def chained(state, batch):
                    def body(i, st):
                        st, _ = step(st, batch, jax.random.fold_in(key1, i))
                        return st
                    st = lax.fori_loop(0, n, body, state)
                    return sum(jnp.sum(x)
                               for x in jax.tree.leaves(st.params)[:4])
                return chained

            flops = float(jax.jit(lambda s, b: step(s, b, key1))
                          .lower(state, batch).compile().cost_analysis()["flops"])
            per = timed_delta(make_chained, state, batch, iters=args.iters)
        elif kind == "grad":  # value_and_grad only, no optimizer
            def loss_fn(params, batch, key):
                def per_video(entry, k):
                    pred, _ = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        entry, train=True, mutable=["batch_stats"],
                        rngs={"dropout": k})
                    return sttran_losses(pred, entry, k, bce=True)["total"]
                keys = jax.random.split(key, B)
                return jax.vmap(per_video)(batch, keys).mean()

            gfn = jax.grad(loss_fn)

            def make_chained(n):
                @jax.jit
                def chained(params, batch):
                    def body(i, ps):
                        g = gfn(ps, batch, jax.random.fold_in(key1, i))
                        return jax.tree.map(lambda p, gg: p - 1e-9 * gg, ps, g)
                    ps = lax.fori_loop(0, n, body, params)
                    return sum(jnp.sum(x) for x in jax.tree.leaves(ps)[:4])
                return chained

            flops = float(jax.jit(gfn).lower(state.params, batch, key1)
                          .compile().cost_analysis()["flops"])
            per = timed_delta(make_chained, state.params, batch,
                              iters=args.iters)
        elif kind == "fwd":  # forward only, train=True
            def fwd(params, batch, key):
                def per_video(entry, k):
                    pred, _ = model.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        entry, train=True, mutable=["batch_stats"],
                        rngs={"dropout": k})
                    return sttran_losses(pred, entry, k, bce=True)["total"]
                keys = jax.random.split(key, B)
                return jax.vmap(per_video)(batch, keys).mean()

            def make_chained(n):
                @jax.jit
                def chained(params, batch):
                    def body(i, c):
                        b2 = batch.replace(
                            features=batch.features + c * 1e-30)
                        return c + fwd(params, b2,
                                       jax.random.fold_in(key1, i)) * 1e-30
                    return lax.fori_loop(0, n, body,
                                         jnp.zeros((), jnp.float32))
                return chained

            flops = float(jax.jit(fwd).lower(state.params, batch, key1)
                          .compile().cost_analysis()["flops"])
            per = timed_delta(make_chained, state.params, batch,
                              iters=args.iters)

        tf = check_physical(flops, per, name)
        print(f"{name:34s} b{B:<3d}: {per * 1e3:8.2f} ms/step "
              f"({B * F / per:9,.0f} frames/s, {tf:5.1f} TFLOP/s, "
              f"{flops / 1e12:.3f} TFLOP/call)", flush=True)

    t0 = time.time()
    bench_step("full_fp32_b16", 16)
    bench_step("full_bf16_b16", 16, dtype=jnp.bfloat16)
    bench_step("full_bf16_b64", 64, dtype=jnp.bfloat16)
    bench_step("full_bf16_b64_remat", 64, dtype=jnp.bfloat16, remat=True)
    bench_step("full_bf16_b64_fused", 64, dtype=jnp.bfloat16, fused=True)
    bench_step("full_fp32_b64_fused", 64, fused=True)
    bench_step("grad_bf16_b16", 16, dtype=jnp.bfloat16, kind="grad")
    bench_step("fwd_train_bf16_b16", 16, dtype=jnp.bfloat16, kind="fwd")
    bench_step("full_fp32_b64", 64)
    print(f"# total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
