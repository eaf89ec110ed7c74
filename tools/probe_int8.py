"""Probe: int8 vs bf16 MXU dot throughput on the real chip.

Motivation: the inference headline sits at ~74% MFU bf16 (compute-bound,
BASELINE.md) and v5e-class MXUs advertise 2x int8 peak vs bf16. If int8
dots actually deliver on this chip, a quantized serving path roughly
doubles the headline; if not, we drop the idea cheaply.

Same forced-synchronization discipline as bench.py: iterations chained
through a carry that perturbs the next iteration's input, ended by a host
fetch of a scalar depending on every output.

Usage: python tools/probe_int8.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(M, K, N, iters, mode):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    if mode == "int8":
        a = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        acc = jnp.int32
    else:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        acc = jnp.float32

    dn = (((1,), (0,)), ((), ()))

    def make_chained(n):
        @jax.jit
        def chained(a, b):
            def body(i, c):
                # perturb one input element by the carry so iteration i+1
                # depends on iteration i's full output (no overlap, no DCE)
                if mode == "int8":
                    a2 = a.at[0, 0].add((c % 2).astype(jnp.int8))
                else:
                    a2 = a.at[0, 0].add((c % 2.0).astype(a.dtype))
                y = lax.dot_general(a2, b, dn, preferred_element_type=acc)
                return y.sum().astype(jnp.int32 if mode == "int8"
                                      else jnp.float32)
            c0 = jnp.zeros((), jnp.int32 if mode == "int8" else jnp.float32)
            return lax.fori_loop(0, n, body, c0)
        return chained

    def measure(fn):
        fn(a, b).item()  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(a, b).item()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # two-point differencing (bench_suite.timed_delta rationale): the fixed
    # ~25-45 ms tunnel cost per fetch swamped these ~0.5 ms dots at the
    # round-2 iteration count, compressing the int8/bf16 ratio toward 1.0 —
    # the "1.03-1.08x, dead end" conclusion was this probe's artifact.
    # Unstable pairs (shared-chip variance making the raw difference tiny or
    # negative) are re-measured, not clamped: a clamped dt prints absurd
    # throughput that trivially passes the <= peak tripwire (r3 advisor)
    f1, f3 = make_chained(iters), make_chained(3 * iters)
    for _ in range(3):
        d1, d3 = measure(f1), measure(f3)
        if d3 - d1 > 0.1 * d3:
            break
    else:
        raise RuntimeError(
            f"differencing unstable after 3 attempts (T({iters})={d1:.4f}s, "
            f"T({3 * iters})={d3:.4f}s) — raise --iters or retry later")
    dt = (d3 - d1) / (2 * iters)
    tops = 2 * M * K * N / dt / 1e12
    # chip-peak tripwire (CLAUDE.md): block_until_ready does not wait on the
    # axon platform, so a silent sync failure prints impossible throughput —
    # exactly the number this probe exists to decide an investment on.
    # int8 peak = 2x the bf16 matmul peak on every TPU generation that has it
    from bench import PEAK_TFLOPS
    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    peak = PEAK_TFLOPS.get(kind, max(PEAK_TFLOPS.values()))
    if kind != "cpu":
        limit = peak * (2 if mode == "int8" else 1)
        assert tops <= limit, (
            f"implied {tops:.0f} T/s exceeds {kind} peak {limit} — timing is "
            f"not measuring real execution")
    print(f"{mode:5s} M={M} K={K} N={N}: {dt*1e3:7.3f} ms/iter  "
          f"{tops:6.1f} T{'OP' if mode=='int8' else 'FLOP'}/s")
    return tops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    import jax
    print("platform:", jax.devices()[0].platform,
          getattr(jax.devices()[0], "device_kind", "?"))
    for (M, K, N) in [(8192, 2048, 2048), (16384, 1936, 1536)]:
        bf = run(M, K, N, args.iters, "bf16")
        i8 = run(M, K, N, args.iters, "int8")
        print(f"  -> int8/bf16 speedup: {i8/bf:.2f}x")


if __name__ == "__main__":
    main()
