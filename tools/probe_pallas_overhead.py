"""Bisect the ~1.3 ms fixed cost seen on every pallas_call variant of the
grouped-conv probe (tools/probe_pallas_ablate.py): minimal kernels vs the
equivalent plain-XLA ops, all timed in the same chained fori_loop.

  tiny-copy     — 1-step grid, copy a (256,128) tile
  slab-copy     — copy (8,40,64,128) bf16 (2.6 MB), 1 step
  slab-copy-g8  — same total bytes, 8 grid steps
  mm-pallas     — (20480,128)@(128,128) matmul in pallas, 1 step
  mm-xla        — the same matmul as a plain jnp.dot
  conv-xla      — the stage4 g8 conv (production reference point)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tools.bench_suite import timed_delta

    print(f"# device: {jax.devices()[0].device_kind} iters={args.iters}",
          flush=True)

    def bench(label, fn, x):
        def make_chained(n):
            @jax.jit
            def chained(x):
                def body(i, c):
                    out = fn(x + (c * 1e-30).astype(x.dtype))
                    return c + jnp.sum(out.astype(jnp.float32)) * 1e-30
                return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
            return chained

        try:
            # differencing cancels the tunnel's fixed per-host-call cost,
            # leaving the genuine per-iteration pallas/XLA overhead
            dt = timed_delta(make_chained, x, iters=args.iters)
            print(f"  {label:14s}: {dt * 1e6:9.1f} us/call", flush=True)
        except Exception as e:
            print(f"  {label:14s}: FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)

    rng = np.random.default_rng(0)

    # tiny-copy
    xt = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))

    def copy_kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    bench("tiny-copy", lambda x: pl.pallas_call(
        copy_kern, out_shape=jax.ShapeDtypeStruct((256, 128), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), xt)

    # slab copies
    xs = jnp.asarray(rng.standard_normal((8, 40, 64, 128)).astype(np.float32),
                     jnp.bfloat16)
    bench("slab-copy", lambda x: pl.pallas_call(
        copy_kern2 := (lambda i, o: o.__setitem__(slice(None), i[:] * 2.0)),
        out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x), xs)

    def copy_g8(x):
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0
        return pl.pallas_call(
            k, grid=(8,),
            in_specs=[pl.BlockSpec((1, 40, 64, 128), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 40, 64, 128), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(xs.shape, xs.dtype))(x)

    bench("slab-copy-g8", copy_g8, xs)

    # matmuls
    xm = jnp.asarray(rng.standard_normal((20480, 128)).astype(np.float32),
                     jnp.bfloat16)
    wm = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32) * 0.05,
                     jnp.bfloat16)

    def mm_pallas(x):
        def k(x_ref, w_ref, o_ref):
            o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                               preferred_element_type=jnp.float32
                               ).astype(o_ref.dtype)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((20480, 128), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, wm)

    bench("mm-pallas", mm_pallas, xm)
    bench("mm-xla", lambda x: jnp.dot(x, wm,
                                      preferred_element_type=jnp.float32
                                      ).astype(x.dtype), xm)

    # production conv reference
    xc = jnp.asarray(rng.standard_normal((8, 38, 64, 1024)).astype(np.float32),
                     jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((3, 3, 128, 1024)).astype(np.float32)
                     * 0.05, jnp.bfloat16)
    bench("conv-xla(g8)", lambda x: lax.conv_general_dilated(
        x, wc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=8), xc)


if __name__ == "__main__":
    main()
