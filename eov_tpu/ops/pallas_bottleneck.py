"""Pallas TPU kernel: VMEM-resident fused ResNet bottleneck stack.

The r1 roofline (DESIGN.md §9) put ~25% of extraction device time in the
stage-1/2 1x1 convs at ~17 TFLOP/s — HBM-bound: XLA round-trips every
56x56 activation map to HBM between convs. This kernel runs a whole stack
of stride-1 bottleneck blocks (conv1 1x1 -> conv2 3x3 -> conv3 1x1 +
residual, folded-BN biases, ReLUs) for ONE image per grid step entirely in
VMEM: the map enters HBM once ([H*W, Cin]) and leaves once ([H*W, Cout]).
At ResNet-50 stage 1 that replaces ~20 MB of per-image HBM traffic with
~2 MB, turning a bandwidth-bound stage into a compute-bound one.

Design notes (TPU/Mosaic-safe by construction):
* Everything is 2-D [rows, channels] — channels on the 128-lane axis,
  pixels on sublanes. No in-kernel reshapes of tiled dims: the caller
  passes activations flattened to [N, H*W, C].
* The 3x3 conv is 9 shifted matmuls over a flat zero-padded scratch
  buffer: neighbor (dy, dx) of flat pixel k lives at k + dy*W + dx, so
  each tap is a static row-slice; horizontal wrap-around at row edges is
  killed by two precomputed column masks (j==0 / j==W-1). Vertical edges
  read the buffer's zeroed pad rows.
* Matmuls accumulate in f32 on the MXU (preferred_element_type) and
  activations round to the compute dtype after each bias+ReLU, matching
  the XLA path's conv-output rounding to within bf16 epsilon.
* Weights (tiny: all of stage 1 is ~0.4 MB bf16) sit whole in VMEM with
  constant index maps, so Mosaic keeps them resident across grid steps and
  double-buffers only the per-image input/output blocks.

Capability parity: component C4's hot loop (SURVEY.md §3.1); semantics
reference is the folded-BN flax/XLA forward (models/resnet.py), parity-
tested in tests/test_pallas_bottleneck.py (interpret mode) and
tests/test_tpu_hardware.py (compiled).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bottleneck_stack", "pack_bottleneck_params"]


def pack_bottleneck_params(block_tree: Mapping[str, Any]) -> dict:
    """Folded block param tree -> the flat arrays the kernel consumes.

    block_tree is one ``layerI_J`` subtree of ``fold_batchnorm`` output:
    conv kernels [kh, kw, cin, cout] + FoldedBias biases [c].
    """
    w1 = block_tree["conv1"]["kernel"][0, 0]            # [Cin, Cmid]
    w2 = block_tree["conv2"]["kernel"]                  # [3, 3, Cmid, Cmid]
    w3 = block_tree["conv3"]["kernel"][0, 0]            # [Cmid, Cout]
    out = {
        "w1": w1,
        "b1": block_tree["bn1"]["bias"][None, :],
        "w2": w2.reshape(9, w2.shape[2], w2.shape[3]),  # tap-major ky*3+kx
        "b2": block_tree["bn2"]["bias"][None, :],
        "w3": w3,
        "b3": block_tree["bn3"]["bias"][None, :],
    }
    if "downsample_conv" in block_tree:
        out["wd"] = block_tree["downsample_conv"]["kernel"][0, 0]
        out["bd"] = block_tree["downsample_bn"]["bias"][None, :]
    return out


def _stack_kernel(*refs, n_blocks, has_proj, h, w, dtype):
    """One image through the whole block stack. refs layout:
    x_ref, (per block: w1,b1,w2,b2,w3,b3[,wd,bd]), out_ref, pad_ref."""
    x_ref = refs[0]
    out_ref = refs[-2]
    pad_ref = refs[-1]
    p = h * w
    s = w + 1  # write offset inside the padded flat buffer (see module doc)

    # Zero the pad buffer once; block centers are fully overwritten below,
    # the border rows/cells stay zero for every block.
    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)

    # Column masks killing horizontal wrap-around of the +-1 dx taps.
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
    mask_l = (col != 0).astype(dtype)        # for dx = -1 taps
    mask_r = (col != w - 1).astype(dtype)    # for dx = +1 taps

    def matmul(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = x_ref[0]  # [P, Cin] compute-dtype
    ri = 1
    for bi in range(n_blocks):
        proj = has_proj[bi]
        w1, b1, w2, b2, w3, b3 = (r[...] for r in refs[ri : ri + 6])
        ri += 6
        if proj:
            wd, bd = refs[ri][...], refs[ri + 1][...]
            ri += 2

        # conv1 1x1 + bias + relu -> padded scratch center.
        y1 = jnp.maximum(matmul(x, w1) + b1, 0.0).astype(dtype)
        pad_ref[s : s + p] = y1

        # conv2 3x3 as 9 shifted matmuls (dy = ky-1, dx = kx-1).
        acc = jnp.zeros((p, w2.shape[-1]), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                tap = pad_ref[off : off + p]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                acc = acc + matmul(tap, w2[ky * 3 + kx])
        y2 = jnp.maximum(acc + b2, 0.0).astype(dtype)

        # conv3 1x1 + residual (projected on the stage-entry block) + relu.
        y3 = matmul(y2, w3) + b3
        res = (matmul(x, wd) + bd) if proj else x.astype(jnp.float32)
        x = jnp.maximum(y3 + res, 0.0).astype(dtype)

    out_ref[0] = x


@functools.partial(
    jax.jit, static_argnames=("h", "w", "interpret")
)
def fused_bottleneck_stack(
    x: jax.Array,                      # [N, H*W, Cin] compute-dtype
    blocks: Sequence[Mapping[str, jax.Array]],  # pack_bottleneck_params
    *,
    h: int,
    w: int,
    interpret: bool = False,
) -> jax.Array:
    """Run a stride-1 bottleneck stack fully VMEM-resident per image.

    Returns [N, H*W, Cout]. Block 0 may carry a projection shortcut
    (wd/bd); all spatial strides must be 1 (true for every non-entry
    ResNet block, and for all of stage 1).
    """
    n, p, cin = x.shape
    if p != h * w:
        raise ValueError(f"x rows {p} != h*w {h * w}")
    dtype = x.dtype
    cmid = blocks[0]["w2"].shape[-1]
    cout = blocks[-1]["w3"].shape[-1]
    has_proj = tuple("wd" in b for b in blocks)
    if not has_proj[0] and cin != cout:
        raise ValueError("first block needs a projection when Cin != Cout")

    flat_params, in_specs = [], [
        pl.BlockSpec((1, p, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    for b in blocks:
        names = ("w1", "b1", "w2", "b2", "w3", "b3")
        if "wd" in b:
            names += ("wd", "bd")
        for k in names:
            arr = b[k]
            arr = arr.astype(jnp.float32 if k.startswith("b") else dtype)
            flat_params.append(arr)
            in_specs.append(
                pl.BlockSpec(
                    arr.shape,
                    # Constant index map: resident across grid steps.
                    lambda i, nd=arr.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
            )

    kernel = functools.partial(
        _stack_kernel, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, dtype=dtype,
    )
    flops_per_img = 0
    for b in blocks:
        flops_per_img += 2 * p * b["w1"].shape[0] * b["w1"].shape[1]
        flops_per_img += 2 * p * 9 * cmid * cmid
        flops_per_img += 2 * p * cmid * cout
        if "wd" in b:
            flops_per_img += 2 * p * b["wd"].shape[0] * cout
    bytes_io = x.dtype.itemsize * n * p * (cin + cout)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, cout), dtype),
        # + 8 rows of slack: the (+1, +1) tap's slice ends at p + 2w + 2.
        scratch_shapes=[pltpu.VMEM(((h + 2) * w + 8, cmid), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=n * flops_per_img,
            bytes_accessed=bytes_io,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *flat_params)
