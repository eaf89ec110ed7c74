"""Probe: Pallas grouped conv vs the production XLA paths, per stage.

For each ResNeXt-152 32x8d stride-1 conv2 geometry (detector/resnet.py) at
the bench input scale (8f x 608x1024 -> stages at /4 /8 /16; stage5 on 300
roi crops at 7x7), measures USEFUL TFLOP/s (2*M*9*c*C — stored-FLOP waste
from packing/densifying does not count) for:

  * xla-cur   — the conv as production runs it today (EFF_GROUPS packing;
                dense for stage2, unpacked g32 for stage5)
  * xla-dense — dense conv at the same geometry (rate ceiling context)
  * pallas    — ops/pallas_grouped_conv.py (block-diag tap matmuls)

stage2 is probed at half height: its full-res one-image block exceeds VMEM
(the kernel raises; production would need H-tiling) — the RATE comparison
is what decides, and rate is geometry-local.

Timing: chained fori_loop carry + dependent scalar fetch + physical-peak
assert (CLAUDE.md axon rules). Usage: python tools/probe_pallas_conv.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nl_vsgg_tpu.detector.resnet import EFF_GROUPS, pack_grouped_kernel
    from nl_vsgg_tpu.ops.pallas_grouped_conv import grouped_conv3x3
    from tools.bench_suite import check_physical, timed_delta

    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"# device: {jax.devices()[0].device_kind} dtype={args.dtype}",
          flush=True)
    F = args.frames
    # (stage, N, H, W, C, eff_key); c = C/32 everywhere
    geoms = [
        ("stage2(38x128)", F, 38, 128, 256, "layer1"),
        ("stage3", F, 76, 128, 512, "layer2"),
        ("stage4", F, 38, 64, 1024, "layer3"),
        ("stage5(rois7)", 300, 7, 7, 2048, "layer4"),
    ]
    rng = np.random.default_rng(0)
    G = 32

    def run(fn, x, w, label, useful):
        def make_chained(n):
            @jax.jit
            def chained(x, w):
                def body(i, c):
                    out = fn(x + (c * 1e-30).astype(x.dtype), w)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
            return chained

        dt = timed_delta(make_chained, x, w, iters=args.iters)
        # physical check vs the compiled cost where XLA can cost it
        try:
            flops = float(jax.jit(fn).lower(x, w).compile()
                          .cost_analysis()["flops"])
        except Exception:
            flops = 0.0
        check_physical(flops, dt, label)
        print(f"  {label:22s}: {dt * 1e3:7.2f} ms  useful {useful / dt / 1e12:6.1f}"
              f" TFLOP/s  (stored {flops / 1e9:8.1f} GFLOP)", flush=True)
        return dt

    for name, N, H, W, C, key in geoms:
        c = C // G
        useful = 2.0 * N * H * W * 9 * c * C
        x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32), dt_)
        w_unpacked = (rng.standard_normal((3, 3, c, C)) * 0.05).astype(np.float32)
        print(f"{name}  N{N} {H}x{W} C{C} c{c}  useful {useful/1e9:.1f} GFLOP",
              flush=True)

        eff = EFF_GROUPS[key]
        w_cur = jnp.asarray(pack_grouped_kernel(w_unpacked, G, eff), dt_)

        def conv(fg):
            def f(x, w):
                return lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=fg)
            return f

        t_cur = run(conv(eff), x, w_cur, f"xla-cur(g{eff})", useful)
        w_dense = jnp.asarray(pack_grouped_kernel(w_unpacked, G, 1), dt_)
        run(conv(1), x, w_dense, "xla-dense", useful)
        wj = jnp.asarray(w_unpacked, dt_)

        def pal(x, w):
            return grouped_conv3x3(x, w, G)

        try:
            t_pal = run(pal, x, wj, "pallas", useful)
            print(f"  -> pallas {t_cur / t_pal:5.2f}x vs production", flush=True)
        except ValueError as e:
            print(f"  pallas: {e}", flush=True)


if __name__ == "__main__":
    main()
