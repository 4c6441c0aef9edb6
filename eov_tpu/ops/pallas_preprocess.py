"""Pallas TPU kernel: fused uint8 crop + normalize (storage-resolution path).

BASELINE.json north star: "per-frame decode->resize->center-crop->normalize
preprocessing fuses into Pallas kernels feeding an XLA ResNet-50". In the
production pod pipeline, frames are stored size-normalized (EOVC raw shards,
short side already 256 — native/eovc_format.md), so the on-device work per
frame is exactly: center crop 224 + u8 -> normalized bf16. This kernel does
that in one VMEM pass — the cropped f32 intermediate that the XLA path
materializes between slice and affine never exists.

(When frames arrive at raw camera resolution, the resize-as-matmul XLA path
in ops/resize.py runs instead; the two compose with identical semantics —
see tests/test_pallas_preprocess.py.)

Layout: the W and C axes are flattened so each frame is a [H, W*3] tile —
channels-last keeps the per-lane affine a repeating-[3] pattern, passed in
as precomputed [1, crop*3] scale/bias rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eov_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["crop_normalize"]


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, top, left, crop, out_dtype,
            group):
    # x_ref: [G, H, W*3] u8; per frame: slice the crop window, convert,
    # affine. G frames per grid step amortize the per-step DMA setup
    # (one frame is only ~150 KB in / ~300 KB out).
    for g in range(group):
        x = x_ref[g, top : top + crop, left * 3 : (left + crop) * 3]
        # Mosaic has no direct u8->f32 cast; widen through int32 first
        # (values are 0..255 so the detour is exact).
        xf = x.astype(jnp.int32).astype(jnp.float32)
        y = xf * scale_ref[0] - bias_ref[0]
        o_ref[g] = y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("crop", "dtype", "group", "interpret")
)
def crop_normalize(
    frames_u8: jax.Array,  # [..., H, W, 3] uint8
    *,
    crop: int = 224,
    dtype=jnp.bfloat16,
    group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Center crop + ImageNet normalize, fused: uint8 -> dtype [..., crop, crop, 3].

    Semantics match ops.preprocess.center_crop + normalize exactly (f32
    affine arithmetic, cast on store). ``group`` frames per grid step is
    available (identical per-frame math; non-divisible counts degrade to
    1) but measured NO WIN at g=4 on v5e (1424 vs the 1435-1452 noise band
    at g=1 — Mosaic already pipelines the per-frame DMAs; BASELINE.md r2),
    so the default stays 1.
    """
    *lead, h, w, c = frames_u8.shape
    if c != 3:
        raise ValueError("expected channels-last RGB")
    if h < crop or w < crop:
        raise ValueError(f"frame {h}x{w} smaller than crop {crop}")
    top, left = (h - crop) // 2, (w - crop) // 2

    b = int(np.prod(lead)) if lead else 1
    g = group if group > 0 and b % group == 0 else 1
    flat = frames_u8.reshape(b, h, w * 3)

    scale = np.tile(1.0 / (255.0 * IMAGENET_STD), crop).astype(np.float32)
    bias = np.tile(IMAGENET_MEAN / IMAGENET_STD, crop).astype(np.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, top=top, left=left, crop=crop,
            out_dtype=jnp.dtype(dtype), group=g,
        ),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, h, w * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, crop * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, crop * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, crop, crop * 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, crop, crop * 3), jnp.dtype(dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * crop * crop * 3,
            bytes_accessed=b * (h * w * 3 + crop * crop * 3 * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, jnp.asarray(scale)[None, :], jnp.asarray(bias)[None, :])

    return out.reshape(*lead, crop, crop, 3)
