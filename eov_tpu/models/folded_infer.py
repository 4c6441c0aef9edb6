"""Functional folded-BN inference forward with Pallas-fused stages.

Capability parity: component C4's inference path (SURVEY.md §2a/3.1). The
flax module (models/resnet.py, folded=True) stays the semantics reference;
this is the same forward written as a pure function over the folded param
tree so whole stages can be swapped for the VMEM-resident Pallas bottleneck
stack (ops/pallas_bottleneck.py) — flax's module structure can't skip its
submodule calls, a plain function can.

Fusion rule per stage: stage 1's entry block is stride-1 (the maxpool
already downsampled), so the WHOLE stage fuses (bottleneck archs include
the projection shortcut; basic archs have none at stage 1); stages 2-4
run their stride-2 entry block in XLA and fuse the stride-1 tail. Both
families run through this forward: bottleneck archs (resnet50/101/152)
use the bottleneck stack kernel, basic archs (resnet18/34) the basic
stack kernel (r3 — two 3x3 convs per block over the same shifted-matmul
scratch machinery).

Parity: tests/test_pallas_bottleneck.py asserts this forward (fused and
unfused) against the flax folded apply.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["folded_feature_apply"]


def _conv(x, kernel, *, stride=1, pad=0, dtype=jnp.bfloat16):
    """flax nn.Conv-equivalent NHWC conv (no bias, default precision)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bias_relu(x, bias, dtype):
    return jnp.maximum(x + bias.astype(dtype), 0)


def _xla_bottleneck(x, p, *, stride, dtype):
    """One folded bottleneck block via XLA (the strided stage entries)."""
    y = _bias_relu(_conv(x, p["conv1"]["kernel"], dtype=dtype),
                   p["bn1"]["bias"], dtype)
    y = _bias_relu(
        _conv(y, p["conv2"]["kernel"], stride=stride, pad=1, dtype=dtype),
        p["bn2"]["bias"], dtype,
    )
    y = _conv(y, p["conv3"]["kernel"], dtype=dtype) + \
        p["bn3"]["bias"].astype(dtype)
    if "downsample_conv" in p:
        r = _conv(x, p["downsample_conv"]["kernel"], stride=stride,
                  dtype=dtype) + p["downsample_bn"]["bias"].astype(dtype)
    else:
        r = x
    return jnp.maximum(y + r, 0)


def _xla_basic(x, p, *, stride, dtype):
    """One folded basic block via XLA (mirrors models/resnet.BasicBlock)."""
    y = _bias_relu(
        _conv(x, p["conv1"]["kernel"], stride=stride, pad=1, dtype=dtype),
        p["bn1"]["bias"], dtype,
    )
    y = _conv(y, p["conv2"]["kernel"], pad=1, dtype=dtype) + \
        p["bn2"]["bias"].astype(dtype)
    if "downsample_conv" in p:
        r = _conv(x, p["downsample_conv"]["kernel"], stride=stride,
                  dtype=dtype) + p["downsample_bn"]["bias"].astype(dtype)
    else:
        r = x
    return jnp.maximum(y + r, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "dtype", "fused_stages", "fused_group", "stem_s2d",
        "pallas_pool", "interpret",
    ),
)
def folded_feature_apply(
    variables,
    frames: jax.Array,            # [..., H, W, 3] float
    *,
    arch: str = "resnet50",
    dtype: Any = jnp.bfloat16,
    fused_stages: tuple[int, ...] = (1,),
    fused_group: int = 1,
    stem_s2d: bool = False,
    pallas_pool: bool | str = False,   # False | True | "fused"
    interpret: bool = False,
) -> jax.Array:
    """frames [..., H, W, 3] -> features [..., D]; folded variables only.

    Reference-exact counterpart of
    ``ResNet(folded=True)(...)`` (models/resnet.py), with the stages named
    in ``fused_stages`` (1-based) running through the Pallas fused
    bottleneck stack instead of per-conv XLA ops.
    """
    from eov_tpu.models import get_arch
    from eov_tpu.ops.pallas_bottleneck import (
        fused_basic_stack, fused_bottleneck_stack, pack_basic_params,
        pack_bottleneck_params,
    )

    _, stage_sizes, bottleneck = get_arch(arch)
    xla_block = _xla_bottleneck if bottleneck else _xla_basic
    if pallas_pool == "fused" and not bottleneck:
        raise ValueError(
            "pallas_pool='fused' is implemented for bottleneck archs only"
        )
    params = variables["params"]

    lead = frames.shape[:-3]
    x = frames.reshape((-1,) + frames.shape[-3:]).astype(dtype)

    # Stem (mirrors models/resnet.py exactly, incl. the s2d rewrite).
    if stem_s2d:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = jax.lax.conv_general_dilated(
            x, params["conv1"]["kernel"].astype(dtype), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        x = jax.lax.conv_general_dilated(
            x, params["conv1"]["kernel"].astype(dtype), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    x = _bias_relu(x, params["bn1"]["bias"], dtype)
    # Maxpool. XLA-level rewrites in ops/pool.py measured negative
    # (BASELINE.md r2): strided-slice max 888 clips/s (tiled-dim stride-2
    # slices relayout-copy), exact separable two-pass reduce_window 1409 vs
    # 1452 (the 112x58-row intermediate's HBM round-trip costs more than
    # dropping 3 of 9 window taps saves). pallas_pool=True runs the pool
    # as a VMEM kernel instead (lane-folded x-pairs, zero-pad exact on the
    # post-ReLU input — ops/pallas_pool.py); pallas_pool="fused" folds the
    # pool into the stage-1 stack kernel's entry (requires stage 1 fused;
    # the pooled map never touches HBM).
    pool_in_stack = pallas_pool == "fused" and 1 in fused_stages
    if pallas_pool == "fused" and not pool_in_stack:
        # 'fused' promises the pool inside the stage-1 stack kernel; with
        # stage 1 not fused it would silently run the STANDALONE Pallas
        # pool (a recorded throughput regression, BASELINE.md r3) under a
        # label the user didn't ask for.
        raise ValueError(
            "pallas_pool='fused' requires stage 1 in fused_stages "
            f"(got {fused_stages!r}); use pallas_pool=True for the "
            "standalone kernel"
        )
    if pool_in_stack:
        pass  # pooled at the fused stage-1 entry below
    elif pallas_pool:
        from eov_tpu.ops.pallas_pool import maxpool_3x3_s2_nonneg

        x = maxpool_3x3_s2_nonneg(x, interpret=interpret)
    else:
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

    p0 = None  # pixels of the first (largest) fused stage
    for i, n_blocks in enumerate(stage_sizes):
        entry_stride = 1 if i == 0 else 2
        fuse = (i + 1) in fused_stages
        j0 = 0
        if fuse and entry_stride != 1:
            # Strided entry block stays XLA; fuse the stride-1 tail.
            x = xla_block(
                x, params[f"layer{i + 1}_0"], stride=2, dtype=dtype
            )
            j0 = 1
        if fuse and n_blocks - j0 > 0:
            pack = pack_bottleneck_params if bottleneck else pack_basic_params
            blocks = [
                pack(params[f"layer{i + 1}_{j}"])
                for j in range(j0, n_blocks)
            ]
            n, h, w, c = x.shape
            if i == 0 and pool_in_stack:
                h, w = h // 2, w // 2  # the stack pools at its entry
            # Row-normalized grouping: later (smaller-map) stages take
            # proportionally more images per grid step so every grid step
            # keeps ~the same matmul row count — the single-image stage-2
            # fusion's 784-row matmuls were the r2 negative result.
            if p0 is None:
                p0 = h * w
            g = max(1, fused_group * (p0 // (h * w)))
            if g > 1 and n % g:
                # Traceable trace-time warning (ADVICE r2): name the user's
                # fused_group alongside the row-normalized per-stage value,
                # so "8 does not divide" maps back to the fused_group=2 set.
                import warnings

                warnings.warn(
                    f"stage {i + 1}: row-normalized fused group {g} "
                    f"(fused_group={fused_group} scaled by the stage's "
                    f"{p0 // (h * w)}x smaller maps) does not divide the "
                    f"image count {n}; running this stage ungrouped",
                    stacklevel=2,
                )
                g = 1
            if i == 0 and pool_in_stack:
                from eov_tpu.ops.pallas_bottleneck import (
                    fused_pool_bottleneck_stack,
                )

                y = fused_pool_bottleneck_stack(
                    x, blocks, group=g, interpret=interpret,
                )
            else:
                stack = (
                    fused_bottleneck_stack if bottleneck else fused_basic_stack
                )
                y = stack(
                    x.reshape(n, h * w, c), blocks, h=h, w=w,
                    group=g, interpret=interpret,
                )
            x = y.reshape(n, h, w, y.shape[-1])
        else:
            for j in range(n_blocks):
                x = xla_block(
                    x, params[f"layer{i + 1}_{j}"],
                    stride=2 if (i > 0 and j == 0) else 1, dtype=dtype,
                )

    x = jnp.mean(x, axis=(-3, -2)).astype(jnp.float32)
    return x.reshape(lead + (x.shape[-1],))
