"""Ablation probe for the pallas grouped-conv kernel's internals.

XProf cannot attribute time inside a pallas_call, so this times variants of
the stage4 kernel body (wrong math where noted — timing only):

  full      — the real kernel (9 shifted tap matmuls + RMW adds)
  mm-only   — 9 matmuls accumulated with NO spatial shifts (pure MXU floor)
  mm1-only  — 1 matmul per step (MXU floor / 9)
  add-only  — 9 shifted RMW adds of a constant (no matmuls; copy/add floor)

Sweeps tn (images per grid step) at each variant. stage4 geometry
(8, 38, 64, 1024), bf16 in / f32 acc. Chained-carry timing.
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.bench_suite import timed_delta

    N, H, W, C = 8, 38, 64, 1024
    cb = 128
    hc = H
    print(f"# device: {jax.devices()[0].device_kind} stage4 {N}x{H}x{W}x{C}",
          flush=True)

    def make(variant, tn, acc_dtype=jnp.float32):
        def kern(x_ref, w_ref, o_ref, acc_ref):
            m = tn * (hc + 2) * W
            xf = x_ref[:].reshape(m, cb)
            taps = [(1, 0)] + [(dh, dw) for dh in (0, 1, 2)
                               for dw in (-1, 0, 1) if (dh, dw) != (1, 0)]
            if variant == "add-only":
                one = jnp.full((tn, hc + 2, W, cb), 0.001, acc_dtype)
                for dh, dw in taps:
                    ow0, ow1 = max(0, -dw), W - max(0, dw)
                    iw0, iw1 = max(0, dw), W - max(0, -dw)
                    src = one[:, dh:dh + hc, iw0:iw1, :]
                    if (dh, dw) == (1, 0):
                        acc_ref[:] = one[:, 1:1 + hc]
                    else:
                        acc_ref[:, :, ow0:ow1, :] = (
                            acc_ref[:, :, ow0:ow1, :] + src)
            elif variant in ("mm-only", "mm1-only"):
                n_mm = 9 if variant == "mm-only" else 1
                acc = jnp.zeros((m, cb), acc_dtype)
                for t in range(n_mm):
                    acc = acc + jnp.dot(
                        xf, w_ref[t // 3, t % 3],
                        preferred_element_type=acc_dtype)
                acc_ref[:] = acc[:tn * hc * W].reshape(tn, hc, W, cb)
            else:  # full
                for dh, dw in taps:
                    pm = jnp.dot(xf, w_ref[dh, dw + 1],
                                 preferred_element_type=acc_dtype)
                    p4 = pm.reshape(tn, hc + 2, W, cb)
                    ow0, ow1 = max(0, -dw), W - max(0, dw)
                    iw0, iw1 = max(0, dw), W - max(0, -dw)
                    src = p4[:, dh:dh + hc, iw0:iw1, :]
                    if (dh, dw) == (1, 0):
                        acc_ref[:] = src
                    else:
                        acc_ref[:, :, ow0:ow1, :] = (
                            acc_ref[:, :, ow0:ow1, :] + src)
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

        def f(x, w):
            return pl.pallas_call(
                kern,
                grid=(N // tn, C // cb),
                in_specs=[
                    pl.BlockSpec((tn, hc + 2, W, cb),
                                 lambda n, b: (n, 0, 0, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, 3, cb, cb), lambda n, b: (0, 0, 0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tn, hc, W, cb),
                                       lambda n, b: (n, 0, 0, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, hc, W, C), x.dtype),
                scratch_shapes=[pltpu.VMEM((tn, hc, W, cb), acc_dtype)],
                interpret=False,
            )(x, w)
        return f

    def make_bt(variant, tn):
        """Block-major layout: x (C//cb, N, H+2, W, cb) — every DMA is a
        contiguous slab (no lane-sliced strided HBM reads)."""
        nb = C // cb

        def kern(x_ref, w_ref, o_ref, acc_ref):
            m = tn * (hc + 2) * W
            xf = x_ref[0].reshape(m, cb)
            taps = [(1, 0)] + [(dh, dw) for dh in (0, 1, 2)
                               for dw in (-1, 0, 1) if (dh, dw) != (1, 0)]
            if variant == "bt-mm1":
                taps = taps[:1]
            for dh, dw in taps:
                pm = jnp.dot(xf, w_ref[dh, dw + 1, 0],
                             preferred_element_type=jnp.float32)
                p4 = pm.reshape(tn, hc + 2, W, cb)
                ow0, ow1 = max(0, -dw), W - max(0, dw)
                iw0, iw1 = max(0, dw), W - max(0, -dw)
                src = p4[:, dh:dh + hc, iw0:iw1, :]
                if (dh, dw) == (1, 0):
                    acc_ref[:] = src
                else:
                    acc_ref[:, :, ow0:ow1, :] = (
                        acc_ref[:, :, ow0:ow1, :] + src)
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

        def f(x, w):
            xt = x.reshape(N, H + 2, W, nb, cb).transpose(3, 0, 1, 2, 4)
            wt = w.reshape(3, 3, cb, nb, cb).transpose(0, 1, 3, 2, 4)
            out = pl.pallas_call(
                kern,
                grid=(nb, N // tn),
                in_specs=[
                    pl.BlockSpec((1, tn, hc + 2, W, cb),
                                 lambda b, n: (b, n, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, 3, 1, cb, cb),
                                 lambda b, n: (0, 0, b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tn, hc, W, cb),
                                       lambda b, n: (b, n, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, N, hc, W, cb), x.dtype),
                scratch_shapes=[pltpu.VMEM((tn, hc, W, cb), jnp.float32)],
                interpret=False,
            )(xt, wt)
            # transpose back to NHWC
            return out.transpose(1, 2, 3, 0, 4).reshape(N, hc, W, C)
        return f

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H + 2, W, C)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((3, 3, cb, C)) * 0.05)
                    .astype(np.float32), jnp.bfloat16)
    useful_mxu = 9 * 2.0 * N * (H + 2) * W * cb * C  # stored tap matmul flops

    def bench(label, fn):
        try:
            def make_chained(n, fn=fn):
                @jax.jit
                def chained(x, w):
                    def body(i, c):
                        out = fn(x + (c * 1e-30).astype(x.dtype), w)
                        return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                    return lax.fori_loop(0, n, body,
                                         jnp.zeros((), jnp.float32))
                return chained

            # two-point differencing cancels the tunnel's fixed ~25-45 ms
            # per-host-call cost (CLAUDE.md timing discipline)
            dt = timed_delta(make_chained, x, w, iters=args.iters)
            rate = useful_mxu / dt / 1e12
            print(f"  {label}: {dt*1e3:7.3f} ms  ({rate:6.1f} T/s "
                  f"stored-tap-rate)", flush=True)
        except Exception as e:
            print(f"  {label}: FAIL {str(e).splitlines()[0][:90]}", flush=True)

    if os.environ.get("ABLATE_NHWC"):
        for variant in ("mm1-only", "mm-only", "add-only", "full"):
            for tn in (2,):
                bench(f"{variant:9s} tn{tn} acc-f32", make(variant, tn))
    for variant in ("bt-mm1", "bt-full"):
        for tn in (2, 4, 8):
            bench(f"{variant:9s} tn{tn}", make_bt(variant, tn))


if __name__ == "__main__":
    main()
