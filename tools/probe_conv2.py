"""Probe: XLA-level reformulations of the ResNeXt grouped 3x3 conv.

probe_pallas_conv.py measured XLA's feature_group_count lowering at 2-4x
below the same-geometry dense-conv rate (stage4 g8: 28.6 TFLOP/s stored vs
116 dense). Two reformulations keep the math on plain DENSE convs:

  * slice-dense — split C into 128-channel super-blocks, run one dense conv
    per block on block-diagonal-packed weights, concat. Stored waste equals
    the 128-block packing (128/c), but each conv is fgc=1.
  * bgc        — move groups to the batch dim (one transpose each way) and
    use batch_group_count=G with the UNPACKED weights: zero stored waste.

Rows report useful TFLOP/s (2*M*9*c*C). Chained-carry timing discipline.
Usage: python tools/probe_conv2.py
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
    from tools.bench_suite import check_physical, timed_delta

    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"# device: {jax.devices()[0].device_kind} dtype={args.dtype}",
          flush=True)
    F = args.frames
    geoms = [
        ("stage2", F, 152, 256, 256, "layer1"),
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
        try:
            flops = float(jax.jit(fn).lower(x, w).compile()
                          .cost_analysis()["flops"])
        except Exception:
            flops = 0.0
        check_physical(flops, dt, label)
        print(f"  {label:18s}: {dt * 1e3:7.2f} ms  useful {useful / dt / 1e12:6.1f}"
              f" TFLOP/s  (stored {flops / 1e9:8.1f} GFLOP)", flush=True)
        return dt

    def conv(fg=1, bg=1):
        def f(x, w):
            return lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=fg, batch_group_count=bg)
        return f

    for name, N, H, W, C, key in geoms:
        c = C // G
        cb = 128
        nb = C // cb
        useful = 2.0 * N * H * W * 9 * c * C
        x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32), dt_)
        w_unpacked = (rng.standard_normal((3, 3, c, C)) * 0.05).astype(np.float32)
        print(f"{name}  N{N} {H}x{W} C{C} c{c}  useful {useful/1e9:.1f} GFLOP",
              flush=True)

        eff = EFF_GROUPS[key]
        w_cur = jnp.asarray(pack_grouped_kernel(w_unpacked, G, eff), dt_)
        t_cur = run(conv(eff), x, w_cur, f"xla-cur(g{eff})", useful)

        # slice-dense: one dense conv per 128-channel super-block
        w128 = jnp.asarray(pack_grouped_kernel(w_unpacked, G, nb), dt_)

        def sliced(x, w):
            outs = [conv()(x[..., b * cb:(b + 1) * cb],
                           w[..., b * cb:(b + 1) * cb])
                    for b in range(nb)]
            return jnp.concatenate(outs, axis=-1) if nb > 1 else outs[0]

        t_sl = run(sliced, x, w128, f"slice-dense(x{nb})", useful)

        # bgc: (N,H,W,G,c) -> (G*N,H,W,c), batch_group_count=G, unpacked w
        wj = jnp.asarray(w_unpacked, dt_)

        def bgc(x, w):
            xg = x.reshape(N, H, W, G, c).transpose(3, 0, 1, 2, 4)
            out = conv(bg=G)(xg.reshape(G * N, H, W, c), w)
            return out

        t_bg = run(bgc, x, wj, "bgc", useful)
        print(f"  -> slice-dense {t_cur / t_sl:5.2f}x, bgc {t_cur / t_bg:5.2f}x "
              f"vs production", flush=True)


if __name__ == "__main__":
    main()
