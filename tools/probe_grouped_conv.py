"""Probe: XLA grouped-conv efficiency per ResNeXt stage geometry (scratch).

For each stage's 3x3 grouped conv (32 groups), measures achieved TFLOP/s for
the grouped conv and for an equivalent-geometry DENSE conv (32x the FLOPs) in
bf16, plus the 1x1 convs for context. Decides whether a custom formulation
could beat XLA's grouped path.

Usage: python tools/probe_grouped_conv.py [--iters N]
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
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tools.bench_suite import check_physical, timed

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    F = args.frames
    # (name, H, W, C_mid) for the 3x3 grouped conv input of each stage at
    # 608x1024 input scale; stage5 runs on 300 roi crops of 14x14
    stages = [
        ("stage2", F, 152, 256, 256),
        ("stage3", F, 76, 128, 512),
        ("stage4", F, 38, 64, 1024),
        ("stage5(rois)", 300, 14, 14, 2048),
    ]
    rng = np.random.default_rng(0)

    for name, N, H, W, C in stages:
        x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32),
                        jnp.bfloat16)
        for kind, groups in (("grouped32", 32), ("dense", 1)):
            w = jnp.asarray(
                rng.standard_normal((3, 3, C // groups, C)).astype(np.float32),
                jnp.bfloat16)

            def conv(x, w, groups=groups):
                return lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=groups)

            @jax.jit
            def chained(x, w):
                def body(i, c):
                    out = conv(x + (c * 1e-30).astype(x.dtype), w)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                return lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))

            flops = float(jax.jit(conv).lower(x, w).compile()
                          .cost_analysis()["flops"])
            dt = timed(lambda a, b: float(chained(a, b)), x, w) / args.iters
            tf = check_physical(flops, dt, f"{name}/{kind}")
            print(f"{name:14s} {kind:10s}: {dt * 1e3:7.2f} ms  {tf:6.1f} TFLOP/s"
                  f"  ({flops / 1e9:7.1f} GFLOP)", flush=True)

        # 1x1 dense conv at the same geometry for context
        w1 = jnp.asarray(rng.standard_normal((1, 1, C, C)).astype(np.float32),
                         jnp.bfloat16)

        def conv1(x, w):
            return lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def chained1(x, w):
            def body(i, c):
                out = conv1(x + (c * 1e-30).astype(x.dtype), w)
                return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
            return lax.fori_loop(0, args.iters, body, jnp.zeros((), jnp.float32))

        flops = float(jax.jit(conv1).lower(x, w1).compile()
                      .cost_analysis()["flops"])
        dt = timed(lambda a, b: float(chained1(a, b)), x, w1) / args.iters
        tf = check_physical(flops, dt, f"{name}/1x1")
        print(f"{name:14s} {'1x1 dense':10s}: {dt * 1e3:7.2f} ms  {tf:6.1f} TFLOP/s"
              f"  ({flops / 1e9:7.1f} GFLOP)", flush=True)


if __name__ == "__main__":
    main()
