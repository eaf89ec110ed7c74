"""Probe: sweep EFFECTIVE group counts for ResNeXt's 32-group 3x3 convs.

A 32-group conv can be computed exactly as a G'-group conv (G' divides 32)
with block-diagonal weights (the added terms multiply stored zeros). FLOPs
scale by 32/G', but XLA's grouped-conv efficiency collapses at small
channels-per-group (0.9 TFLOP/s at 8 ch/group, tools/probe_grouped_conv.py),
so a middle G' can beat both ends. This measures the sweep per stage.

Usage: python tools/probe_group_pack.py [--iters N]
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
    p.add_argument("--stage5_only", action="store_true",
                   help="just the stage5 rows (pack sweep + RoI-batch "
                        "sweep) — VERDICT r3 #8")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tools.bench_suite import check_physical, timed_delta

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    F = args.frames
    stages = [
        ("stage2", F, 152, 256, 256),
        ("stage3", F, 76, 128, 512),
        ("stage4", F, 38, 64, 1024),
        ("stage5(rois)", 300, 14, 14, 2048),
    ]
    rng = np.random.default_rng(0)

    if args.stage5_only:
        stages = stages[-1:]

    def time_conv(x, w, gp, label, useful_flops=None):
        def conv(x, w, gp=gp):
            return lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=gp)

        def make_chained(n):
            @jax.jit
            def chained(x, w):
                def body(i, c):
                    out = conv(x + (c * 1e-30).astype(x.dtype), w)
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
            return chained

        flops = float(jax.jit(conv).lower(x, w).compile()
                      .cost_analysis()["flops"])
        dt = timed_delta(make_chained, x, w, iters=args.iters)
        check_physical(flops, dt, label)
        u = useful_flops if useful_flops is not None else flops
        print(f"{label:36s}: {dt * 1e3:7.2f} ms  {flops / dt / 1e12:6.1f} "
              f"TFLOP/s stored  {u / dt / 1e12:6.1f} useful", flush=True)
        return dt

    if args.stage5_only:
        # VERDICT r3 #8: is stage5's 32%-of-peak the 64-ch groups or the
        # (300, 14, 14) small-spatial geometry? Probe the same g32 conv on
        # the halo-packed layout: 300 RoIs as a 15x20 grid of 16x16 cells
        # (14x14 data + the conv's own zero ring), one (1, 240, 320, C)
        # image. A 3x3 SAME conv there is exact for the kept cell
        # interiors (the halo ring isolates neighbors), stored FLOPs grow
        # 1.31x, and the scatter/gather adds ~2 HBM passes — worth it only
        # if the rate jump is large. Geometry from the reference's C5 head
        # (models/vinvl/vinvl_x152c4.yaml: RESNETS.NUM_GROUPS 32,
        # WIDTH_PER_GROUP 8, POOLER_RESOLUTION 14, 300 test RoIs).
        C = 2048
        n_roi, cell, gh, gw = 300, 16, 15, 20
        x = jnp.asarray(rng.standard_normal((n_roi, 14, 14, C))
                        .astype(np.float32), jnp.bfloat16)
        w32 = jnp.asarray(rng.standard_normal((3, 3, C // 32, C))
                          .astype(np.float32), jnp.bfloat16)
        useful = 2.0 * n_roi * 14 * 14 * 3 * 3 * (C // 32) * C
        time_conv(x, w32, 32, "stage5 g32 (300,14,14) baseline", useful)
        xg = jnp.zeros((1, gh * cell, gw * cell, C), jnp.bfloat16)
        xg = xg.at[0].set(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            .reshape(gh, gw, cell, cell, C)
            .transpose(0, 2, 1, 3, 4).reshape(gh * cell, gw * cell, C))
        time_conv(xg, w32, 32, "stage5 g32 halo-grid (1,240,320)", useful)
        # same data as more frames/larger spatial (rate probes only —
        # not semantics-preserving reshapes): where does the rate recover?
        for shape in ((75, 28, 28), (12, 70, 70), (3, 140, 140)):
            n2, h2, w2 = shape
            x2 = jnp.asarray(rng.standard_normal((n2, h2, w2, C))
                             .astype(np.float32), jnp.bfloat16)
            time_conv(x2, w32, 32,
                      f"stage5 g32 rate-probe {shape}", None)
        return

    for name, N, H, W, C in stages:
        x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32),
                        jnp.bfloat16)
        base = None
        for gp in (32, 16, 8, 4, 2, 1):
            w = jnp.asarray(
                rng.standard_normal((3, 3, C // gp, C)).astype(np.float32),
                jnp.bfloat16)

            def conv(x, w, gp=gp):
                return lax.conv_general_dilated(
                    x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=gp)

            def make_chained(n):
                @jax.jit
                def chained(x, w):
                    def body(i, c):
                        out = conv(x + (c * 1e-30).astype(x.dtype), w)
                        return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return lax.fori_loop(0, n, body,
                                         jnp.zeros((), jnp.float32))
                return chained

            flops = float(jax.jit(conv).lower(x, w).compile()
                          .cost_analysis()["flops"])
            dt = timed_delta(make_chained, x, w, iters=args.iters)
            check_physical(flops, dt, f"{name}/g{gp}")
            if base is None:
                base = dt
            print(f"{name:14s} g{gp:<3d} (ch/grp {C // gp:4d}): {dt * 1e3:7.2f} ms"
                  f"  {flops / dt / 1e12:6.1f} TFLOP/s  {base / dt:5.2f}x vs g32",
                  flush=True)


if __name__ == "__main__":
    main()
