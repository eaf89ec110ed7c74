"""Pallas grouped 3x3 convolution (stride 1) — KEPT AS A NEGATIVE RESULT.

Status: NOT wired into the detector, and should not be. It was built
against probe numbers later found to carry the tunneled platform's fixed
~25-45 ms per-timed-call cost (see bench_suite.timed_delta): under
corrected two-point-differenced timing, XLA's grouped conv at the
EFF_GROUPS packings already runs at 115-196 TFLOP/s stored (58-99% of the
bf16 peak; tools/probe_group_pack.py, TPU v5 lite r3) — e.g. the stage4
conv2 is 0.39 ms, not the 1.56 ms the contaminated probe reported. This
kernel measured ~26 TFLOP/s stored-equivalent on the same geometry
(tools/probe_pallas_ablate.py: time is flat across 1-vs-9 matmuls and
adds-only variants, i.e. bound by per-step VMEM block traffic, far from its
own c/128 structural ceiling). The file stays as the measured record with
passing parity tests so the approach is not re-attempted without new
evidence; the probes under tools/ document the full investigation.

Design (for the record): a stride-1 3x3 conv is nine shifted matmuls; with
groups packed block-diagonally into 128-lane super-groups (exact — the
extra multiplies hit stored zeros, and adding 0.0 is IEEE-exact), each tap
is one (M, 128) x (128, 128) MXU matmul whose LHS is the CONTIGUOUS input
block (zero-copy reshape, no im2col). Tap outputs accumulate into an fp32
VMEM scratch with partial-rectangle adds implementing the zero padding.
Tall feature maps are split into row chunks with a 1-row halo at the
wrapper (the pallas grid cannot express overlapping blocks); every chunk
reuses one compiled kernel.

Semantics match `lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups)`
(the conv2 of detector/resnet.py::Bottleneck at stride 1 — reference
architecture: maskrcnn_benchmark BottleneckWithFixedBatchNorm, NUM_GROUPS
32, STRIDE_IN_1X1 False, vendored via
/root/reference/models/vinvl/vinvl_x152c4.yaml), with optional fused
scale/bias/relu epilogue (the FrozenBN + relu that always follows conv2).
Parity pinned by tests/test_pallas_grouped_conv.py.

Utilization ceiling per 128-lane super-group with c channels/group: the
diagonal density is c/128, so useful throughput tops out at (c/128) x the
dense matmul rate — structural for ANY systolic mapping of a grouped conv
(including XLA's packed form), which is why the corrected EFF_GROUPS rates
are already at the speed of light for this op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-step VMEM target for tile selection (of the ~16 MB/core; leaves room
# for Pallas' double-buffered in/out windows and the weight block)
_VMEM_BUDGET = 11 * 1024 * 1024


def _block_diag_pack(w: jnp.ndarray, cb: int) -> jnp.ndarray:
    """(3, 3, c, C) grouped HWIO kernel -> (3, 3, cb, C) block-diagonal form
    (cb-channel super-groups; zeros off the per-group diagonal). jnp-level so
    it traces inside jit; 9*cb*C elements, negligible next to the conv."""
    kh, kw, c, C = w.shape
    lg = cb // c                       # original groups per super-group
    nb = C // cb                       # number of super-groups
    wr = w.reshape(kh, kw, c, nb, lg, c)            # [h, w, i, b, l, o]
    eye = jnp.eye(lg, dtype=w.dtype)                # [j, l]
    # wp[h, w, j, i, b, l, o] = wr[h, w, i, b, l, o] * (j == l)
    wp = wr[:, :, None] * eye[None, None, :, None, None, :, None]
    return wp.reshape(kh, kw, cb, C)


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *,
            tn: int, hc: int, W: int, cb: int, relu: bool):
    """x (tn, hc+2, W, cb) — chunk rows with 1-row halo each side;
    o (tn, hc, W, cb) — output rows 1..hc+1 of the chunk. W edges use
    partial-rectangle adds (zero padding); H needs none (halo rows)."""
    m = tn * (hc + 2) * W
    xf = x_ref[:].reshape(m, cb)                    # contiguous: zero-copy
    # center tap first: full-rectangle write initializes the accumulator
    taps = [(1, 0)] + [(dh, dw) for dh in (0, 1, 2) for dw in (-1, 0, 1)
                       if (dh, dw) != (1, 0)]
    for dh, dw in taps:
        p = jnp.dot(xf, w_ref[dh, dw + 1],
                    preferred_element_type=jnp.float32)
        p4 = p.reshape(tn, hc + 2, W, cb)
        # out row h (chunk row h+1) reads chunk row h+dh, col w+dw
        ow0, ow1 = max(0, -dw), W - max(0, dw)
        iw0, iw1 = max(0, dw), W - max(0, -dw)
        src = p4[:, dh:dh + hc, iw0:iw1, :]
        if (dh, dw) == (1, 0):
            acc_ref[:] = src
        else:
            acc_ref[:, :, ow0:ow1, :] = acc_ref[:, :, ow0:ow1, :] + src
    out = acc_ref[:] + b_ref[0]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_tiles(N: int, H: int, W: int, cb: int, itemsize: int):
    """(tn, hc): largest batch tile at full H, else 1-image row chunks."""
    def fits(tn, hc):
        x_b = tn * (hc + 2) * W * cb * itemsize
        p_b = tn * (hc + 2) * W * cb * 4
        acc_b = tn * hc * W * cb * 4
        o_b = tn * hc * W * cb * itemsize
        return 2 * x_b + p_b + acc_b + 2 * o_b <= _VMEM_BUDGET
    for tn in range(N, 0, -1):
        if N % tn == 0 and fits(tn, H):
            return tn, H
    for hc in range(H - 1, 0, -1):
        if fits(1, hc):
            return 1, hc
    raise ValueError(f"row of {W}x{cb} exceeds VMEM; use the XLA path")


@partial(jax.jit, static_argnames=("groups", "relu", "block_c", "out_dtype",
                                   "interpret"))
def grouped_conv3x3(x: jnp.ndarray, w: jnp.ndarray, groups: int,
                    bias: jnp.ndarray | None = None, *, relu: bool = False,
                    block_c: int = 128, out_dtype=None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Grouped 3x3 conv, stride 1, SAME (1,1) padding, NHWC/HWIO.

    x (N, H, W, C); w (3, 3, C//groups, C) — the UNPACKED grouped kernel.
    `bias` (C,) adds per-channel after the conv and `relu` clamps at 0 —
    together with scaling w by the FrozenBN scale they fuse the detector's
    conv2+bn2+relu epilogue into the kernel. Requires block_c % (C//groups)
    == 0 and C % block_c == 0 (all ResNeXt stages: c in {8,16,32,64})."""
    N, H, W, C = x.shape
    c = C // groups
    if w.shape != (3, 3, c, C):
        raise ValueError(f"expected unpacked kernel (3,3,{c},{C}), got {w.shape}")
    cb = min(C, max(block_c, c))
    if C % cb or cb % c:
        raise ValueError(f"C={C} c={c} not tileable by block_c={block_c}")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    tn, hc = _pick_tiles(N, H, W, cb, jnp.dtype(x.dtype).itemsize)
    wp = _block_diag_pack(w, cb).astype(x.dtype)
    b = jnp.zeros((C,), jnp.float32) if bias is None else bias
    b = b.astype(jnp.float32).reshape(1, C)
    out_dtype = out_dtype or x.dtype
    nch = -(-H // hc)
    # pad: 1 halo row top/bottom + fill the last chunk to hc rows
    xp = jnp.pad(x, ((0, 0), (1, 1 + nch * hc - H), (0, 0), (0, 0)))

    kern = partial(_kernel, tn=tn, hc=hc, W=W, cb=cb, relu=relu)
    call = pl.pallas_call(
        kern,
        grid=(N // tn, C // cb),
        in_specs=[
            pl.BlockSpec((tn, hc + 2, W, cb), lambda n, b_: (n, 0, 0, b_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cb, cb), lambda n, b_: (0, 0, 0, b_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda n, b_: (0, b_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, hc, W, cb), lambda n, b_: (n, 0, 0, b_),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, hc, W, C), out_dtype),
        scratch_shapes=[pltpu.VMEM((tn, hc, W, cb), jnp.float32)],
        interpret=interpret,
    )
    chunks = [call(jax.lax.slice_in_dim(xp, i * hc, i * hc + hc + 2, axis=1),
                   wp, b) for i in range(nch)]
    out = jnp.concatenate(chunks, axis=1) if nch > 1 else chunks[0]
    return out[:, :H] if nch * hc != H else out
