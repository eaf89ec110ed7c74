"""MFU-vs-batch curve for the full train step (VERDICT r3 #2).

Sweeps batch_videos in {64, 128, 256} for both relation families (STTran,
DSG-DETR) at bf16 production settings, with the forced-synchronization
discipline from bench.py (chained fori_loop, dependent scalar fetch, peak-
TFLOPs tripwire). All variants are compiled up front and the timed calls
are INTERLEAVED round-robin across variants (3 rounds, per-variant min) so
shared-chip drift hits every point equally — cross-process comparisons are
noise-dominated on this chip (CLAUDE.md).

The question this answers: round 3 characterized train MFU (42.6% STTran /
41% DSG-DETR) only at b64 and noted ~5% of the step (optimizer pass + idle)
should amortize with batch. This curve decides the production
`batch_videos` (utils/config.py) from data.

Usage: python tools/probe_mfu_batch.py [--iters N] [--batches 64,128,256]
       [--families sttran,dsg] [--rounds R]
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
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--families", default="sttran,dsg")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--oom_backoff", type=float, default=45.0,
                   help="seconds to sleep after a timed round fails with "
                        "RESOURCE_EXHAUSTED (co-tenants on the shared chip "
                        "come and go; an immediate retry usually re-fails)")
    p.add_argument("--remat_batches", default="",
                   help="comma batch sizes to ALSO try with remat=True "
                        "(sttran only) — the fallback when a plain big "
                        "batch OOMs the 16 GB HBM")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nl_vsgg_tpu.data.synthetic import make_synthetic_entry
    from nl_vsgg_tpu.models.dsg_detr import DSGDETR
    from nl_vsgg_tpu.models.sttran import STTran
    from nl_vsgg_tpu.train import (create_train_state, make_optimizer,
                                   make_train_step, stack_entries)
    from tools.bench_suite import check_physical

    # persistent jit cache (same dir as conftest): the 6 train-step
    # compiles dominate probe wall time otherwise
    if not os.environ.get("NL_VSGG_NO_JAX_CACHE"):
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/nl_vsgg_jax"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)
    FEAT, F = 2048, 32
    rng = np.random.default_rng(0)
    key1 = jax.random.key(1, impl="rbg")
    dtype = jnp.bfloat16

    # one entry pool reused across batch sizes so the only thing that
    # changes between variants is B
    pool = [make_synthetic_entry(rng, n_frames=F, objs_per_frame=3,
                                 bucket_boxes=128, bucket_rels=96,
                                 feat_dim=FEAT) for _ in range(16)]

    def make_batch(B):
        # stack + cast on HOST, one device_put per leaf: jnp.stack of numpy
        # entries uploads every leaf then stacks ON DEVICE (2x peak HBM),
        # and a device-side fp32->bf16 cast of union_feat adds another
        # transient 2x — at b128 that transient alone is ~5 GB and OOMs a
        # co-tenanted 16 GB chip even though the final batch fits
        import ml_dtypes
        entries = [pool[i % len(pool)] for i in range(B)]
        host = jax.tree.map(lambda *xs: np.stack(xs), *entries)
        host = host.replace(
            union_feat=host.union_feat.astype(ml_dtypes.bfloat16),
            spatial_masks=host.spatial_masks.astype(ml_dtypes.bfloat16))
        return jax.tree.map(jnp.asarray, host)

    batches = [int(b) for b in args.batches.split(",") if b]
    families = [f for f in args.families.split(",") if f]

    K = 3
    remat_batches = [int(b) for b in args.remat_batches.split(",") if b]
    grid = [(f, B, False) for f in families for B in batches]
    grid += [("sttran", B, True) for B in remat_batches]
    variants = []  # (name, B, N, flops, f1, fk, state, batch)
    made = {}
    batch_by_B = {}
    for gi, (family, B, remat) in enumerate(grid):
        if (family, remat) not in made:
            try:
                if family == "sttran":
                    model = STTran(mode="sgdet", feat_dim=FEAT, dtype=dtype,
                                   remat=remat)
                else:
                    model = DSGDETR(mode="sgdet", feat_dim=FEAT, dtype=dtype)
                tx = make_optimizer(lr=1e-5)
                state, tx2 = create_train_state(model, pool[0],
                                                jax.random.key(0), tx=tx)
                made[(family, remat)] = (state, make_train_step(model, tx2,
                                                                bce=True))
            except Exception as e:  # init itself can OOM a full chip;
                # memoize the failure so later grid entries with the same
                # key skip the 1-3 min re-attempt on this 1-core host
                print(f"# {family} state init FAILED — {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                made[(family, remat)] = None
                continue
        if made[(family, remat)] is None:
            print(f"# {family}_b{B}: skipped (state init failed earlier)",
                  flush=True)
            continue
        state, step = made[(family, remat)]
        if True:
            name = f"{family}_b{B}" + ("_remat" if remat else "")
            try:
                # identical content across families at the same B: share one
                # device batch (halves the probe's resident HBM footprint)
                if B not in batch_by_B:
                    batch_by_B[B] = make_batch(B)
                batch = batch_by_B[B]
            except Exception as e:  # big batches may not even ALLOCATE on
                # a co-tenanted chip (the b128 stack itself can hit
                # RESOURCE_EXHAUSTED) — record and keep sweeping
                print(f"# {name}: batch alloc FAILED — "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue

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
            try:
                flops = float(
                    jax.jit(lambda s, b, step=step: step(s, b, key1))
                    .lower(state, batch).compile()
                    .cost_analysis()["flops"])
                # scale iters down for big batches: comparable timed windows
                N = max(2, args.iters * min(batches + remat_batches) // B)
                f1, fk = chained_fn(N), chained_fn(K * N)
                float(f1(state, batch)), float(fk(state, batch))
            except Exception as e:  # RESOURCE_EXHAUSTED on the 16 GB HBM
                print(f"# {name}: FAILED after {time.time() - t0:.0f}s — "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                del batch
                # free the cached device batch unless a LATER grid variant
                # at the same B could still use it (otherwise batch_by_B
                # keeps it resident and every later variant feels the OOM)
                if not any(b == B for _, b, _ in grid[gi + 1:]):
                    batch_by_B.pop(B, None)
                continue
            print(f"# compiled {name} in {time.time() - t0:.0f}s "
                  f"({flops / 1e12:.2f} TFLOP/call)", flush=True)
            variants.append((name, B, N, flops, f1, fk, state, batch))

    # free every cached device batch no SURVIVING variant references (a B
    # whose every variant failed — state init, alloc, or compile — would
    # otherwise stay resident through the timing rounds; the retained 5 GB
    # b256 batch OOMed every timed step of the first round-5 run)
    live_Bs = {B for _, B, *_ in variants}
    for B in list(batch_by_B):
        if B not in live_Bs:
            del batch_by_B[B]

    from tools.bench_suite import timed
    best = {name: float("inf") for name, *_ in variants}
    for r in range(args.rounds):
        for name, B, N, flops, f1, fk, state, batch in variants:
            try:
                d1 = timed(lambda: float(f1(state, batch)), reps=3)
                dk = timed(lambda: float(fk(state, batch)), reps=3)
            except Exception as e:
                print(f"# round {r} {name}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                if "RESOURCE_EXHAUSTED" in str(e) and args.oom_backoff:
                    time.sleep(args.oom_backoff)
                continue
            if dk - d1 <= 0.1 * dk:
                print(f"# round {r} {name}: unstable pair "
                      f"({d1:.3f}/{dk:.3f}s), skipped", flush=True)
                continue
            per = (dk - d1) / ((K - 1) * N)
            best[name] = min(best[name], per)
            print(f"# round {r} {name}: {per * 1e3:.2f} ms/step", flush=True)

    from bench import PEAK_TFLOPS
    peak = PEAK_TFLOPS.get(dev.device_kind, max(PEAK_TFLOPS.values()))
    print()
    for name, B, N, flops, *_ in variants:
        per = best[name]
        if not np.isfinite(per):
            print(f"{name:14s}: no stable measurement", flush=True)
            continue
        tf = check_physical(flops, per, name)
        print(f"{name:14s}: {per * 1e3:8.2f} ms/step "
              f"({B * F / per:9,.0f} frames/s, {tf:5.1f} TFLOP/s, "
              f"MFU {100 * tf / peak:4.1f}%, "
              f"{flops / 1e12:.2f} TFLOP/call)", flush=True)


if __name__ == "__main__":
    main()
