"""A/B: hand-fused MaskedBatchNorm backward vs autodiff (VERDICT r3 #2).

Measures the full b64x32f bf16 STTran train step with layers.MBN_CUSTOM_VJP
on vs off, both variants compiled up front and the timed calls interleaved
round-robin (shared-chip drift hits both equally — CLAUDE.md A/B rule).
Per-variant numbers come from two-point differencing (N vs 3N chained
steps, fixed dispatch+fetch cost cancels).

Target: the ~15%% composite union/spatial_conv HBM-bound backward share —
bwd spatial_conv/bn1 reduce_sum 2.32%% + conv1 reduce_sum 1.95%% in the r3
attribution table (BASELINE.md).

Usage: python tools/probe_bn_bwd.py [--iters N] [--rounds R] [--batch B]
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
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models import layers
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step, stack_entries)
    from tools.bench_suite import check_physical, timed

    if not os.environ.get("NL_VSGG_NO_JAX_CACHE"):
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/nl_vsgg_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    FEAT, F, B = 2048, 32, args.batch
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    entries = [make_synthetic_entry(rng, n_frames=F, objs_per_frame=3,
                                    bucket_boxes=128, bucket_rels=96,
                                    feat_dim=FEAT) for _ in range(B)]
    batch = jax.tree.map(jnp.asarray, stack_entries(entries))
    batch = batch.replace(union_feat=batch.union_feat.astype(dtype),
                          spatial_masks=batch.spatial_masks.astype(dtype))
    key1 = jax.random.key(1, impl="rbg")
    N, K = args.iters, 3

    variants = {}
    for name, custom in (("custom_vjp", True), ("autodiff", False)):
        # the switch is read at TRACE time, so compile eagerly before
        # flipping it for the next variant
        layers.MBN_CUSTOM_VJP = custom
        model = STTran(mode="sgdet", feat_dim=FEAT, dtype=dtype)
        tx = make_optimizer(lr=1e-5)
        state, tx2 = create_train_state(model, entries[0],
                                        jax.random.key(0), tx=tx)
        step = make_train_step(model, tx2, bce=True)

        def chained_fn(n, step=step):
            @jax.jit
            def chained(state, batch):
                def body(i, st):
                    st, _ = step(st, batch, jax.random.fold_in(key1, i))
                    return st
                st = lax.fori_loop(0, n, body, state)
                return sum(jnp.sum(x)
                           for x in jax.tree.leaves(st.params)[:4])
            return chained

        t0 = time.time()
        flops = float(jax.jit(lambda s, b, step=step: step(s, b, key1))
                      .lower(state, batch).compile()
                      .cost_analysis()["flops"])
        f1, fk = chained_fn(N), chained_fn(K * N)
        float(f1(state, batch)), float(fk(state, batch))  # compile now
        print(f"# compiled {name} in {time.time() - t0:.0f}s "
              f"({flops / 1e12:.2f} TFLOP/call)", flush=True)
        variants[name] = (f1, fk, state, flops)

    layers.MBN_CUSTOM_VJP = True  # restore default
    best = {name: float("inf") for name in variants}
    for r in range(args.rounds):
        for name, (f1, fk, state, flops) in variants.items():
            d1 = timed(lambda: float(f1(state, batch)), reps=3)
            dk = timed(lambda: float(fk(state, batch)), reps=3)
            if dk - d1 <= 0.1 * dk:
                print(f"# round {r} {name}: unstable pair "
                      f"({d1:.3f}/{dk:.3f}s), skipped", flush=True)
                continue
            per = (dk - d1) / ((K - 1) * N)
            best[name] = min(best[name], per)
            print(f"# round {r} {name}: {per * 1e3:.2f} ms/step", flush=True)

    print()
    for name, (f1, fk, state, flops) in variants.items():
        per = best[name]
        tf = check_physical(flops, per, name)
        print(f"{name:12s}: {per * 1e3:8.2f} ms/step "
              f"({B * F / per:9,.0f} frames/s, {tf:5.1f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
