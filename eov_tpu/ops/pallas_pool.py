"""Pallas TPU kernel: the stem 3x3/s2 maxpool of a non-negative input.

Capability parity: component C4's stem pool (SURVEY.md §3.1 hot loop; the
reference uses torchvision ResNet's ``nn.MaxPool2d(3, 2, 1)``). Semantics
reference is ``lax.reduce_window(max)`` exactly as models/resnet.py and
models/folded_infer.py emit it; parity is asserted in
tests/test_pallas_pool.py (interpret) and tests/test_tpu_hardware.py
(compiled).

Why: the r2 trace (DESIGN.md §9) put the XLA ``reduce_window`` lowering at
6.9% of the extraction step, ~2.5x its HBM roofline — VPU-bound. The two
XLA-level rewrites (ops/pool.py) measured NEGATIVE because stride-2 slices
along tiled dims force relayout copies in HBM. This kernel sidesteps the
strided access entirely, in VMEM:

* **x-stride-2 becomes a lane slice.** The caller views the NHWC input
  [N, H, W, C] as [N, H, W/2, 2C] — a row-major-free reinterpretation that
  puts each even/odd x-pair side by side on the 128-lane axis (C=64 stem
  channels -> exactly 128 lanes). ``even_x = x[..., :C]``,
  ``odd_x = x[..., C:]`` are lane slices; the third horizontal tap
  (x = 2j-1) is the previous pair's odd lane, one sublane-shift away.
* **y-stride-2 becomes a leading-dim index.** After the horizontal max the
  rows live on the UNTILED leading axis; splitting it [H] -> [H/2, 2] and
  indexing is free (no tiled-dim reshape).
* **Zero padding is exact** because the stem pool input is post-ReLU
  (>= 0): max(window ∪ {0}) == max(window) when every element >= 0 and
  the true reduce_window pad is -inf over >= 0 values. The kernel checks
  nothing at runtime — the caller contract is a non-negative input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["maxpool_3x3_s2_nonneg", "pool_lane_folded"]


def _shift_down(a, axis):
    # a shifted +1 along `axis` with a zero fill at index 0. Mosaic rejects
    # the natural concat-with-zeros spelling ("result/input offset mismatch
    # on non-concat dimension" — the operands' vpad offsets differ), so the
    # shift is a circular roll plus an iota mask instead. Mosaic's rotate
    # only handles 32-bit data, so sub-32-bit dtypes round-trip through
    # f32 (the roll is pure data movement; the casts are exact for bf16
    # values, which are a subset of f32).
    if a.dtype.itemsize < 4:
        rolled = pltpu.roll(a.astype(jnp.float32), shift=1,
                            axis=axis).astype(a.dtype)
    else:
        rolled = pltpu.roll(a, shift=1, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    return jnp.where(idx == 0, jnp.zeros_like(rolled), rolled)


def pool_lane_folded(v, c):
    """Lane-folded in-VMEM 3x3/s2 maxpool: [2H, W, 2C] view -> [H, W, C].

    ``v`` is the row-major-free reinterpretation of a non-negative
    [2H, 2W, C] NHWC image as [2H, W, 2C] (even/odd x-pairs side by side
    on the lane axis). Shared by the standalone kernel below and the
    pool-in-stack entry (ops/pallas_bottleneck.py _pool_stack_kernel) so
    the two paths cannot drift.
    """
    hh, wp, _ = v.shape
    even_x = v[:, :, :c]               # x = 2j   taps
    odd_x = v[:, :, c:]                # x = 2j+1 taps
    # x = 2j-1 tap: previous pair's odd lane; j=0 window pads with 0.
    hmax = jnp.maximum(
        jnp.maximum(even_x, odd_x), _shift_down(odd_x, axis=1)
    )                                  # [2H, W, C]
    # Vertical taps {2i-1, 2i, 2i+1}: split rows into (even, odd) on the
    # leading axis — layout-free — and shift the odd rows down by one.
    pairs = hmax.reshape(hh // 2, 2, wp, c)
    h_odd = pairs[:, 1]                # rows 2i+1
    return jnp.maximum(                # rows 2i, 2i+1, 2i-1 (pads 0)
        jnp.maximum(pairs[:, 0], h_odd), _shift_down(h_odd, axis=0)
    )


def _pool_kernel(x_ref, out_ref, *, c):
    # x_ref: [1, H, W/2, 2C] one image; out_ref: [1, H/2, W/2, C].
    out_ref[0] = pool_lane_folded(x_ref[0], c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxpool_3x3_s2_nonneg(x: jax.Array, *, interpret: bool = False):
    """3x3 stride-2 pad-1 max pool of a NON-NEGATIVE NHWC input.

    Equivalent to ``lax.reduce_window(x, -inf, max, (1,3,3,1), (1,2,2,1),
    [(0,0),(1,1),(1,1),(0,0)])`` whenever ``x >= 0`` (the stem pool input
    is post-ReLU). Requires even H and W (stem: 112x112 -> 56x56).
    """
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"even H/W required, got {h}x{w}")
    xv = x.reshape(n, h, w // 2, 2 * c)  # row-major free view
    kernel = functools.partial(_pool_kernel, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w // 2, 2 * c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h // 2, w // 2, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n * (h // 2) * (w // 2) * c * 8,  # 8 max ops/output
            bytes_accessed=x.dtype.itemsize * n * (h * w + h * w // 4) * c,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xv)
    return out
