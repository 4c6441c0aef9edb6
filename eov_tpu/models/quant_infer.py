"""Post-training int8 quantized inference forward (opt-in, OFF by default).

Capability row: SURVEY.md §2a C4 (backbone) on BASELINE.json:5's throughput
axis. VERDICT r4 weak #5: v5e's int8 MXU path (~2x the bf16 peak rate) was
the one untried single-chip extraction axis. This module post-training-
quantizes the FOLDED inference path (models/resnet.fold_batchnorm output —
quantization composes with BN folding exactly like every other inference
rewrite here):

* weights — per-output-channel symmetric int8: one scale per output
  channel, ``s_w[o] = max|K[..., o]| / 127``;
* activations — per-conv-site symmetric int8: scales calibrated by running
  the f32 folded forward over calibration clips (synthetic fixtures by
  default; pass real frames for deployment) recording ``max|x|`` at every
  conv input;
* convs execute int8 x int8 -> int32 on the MXU
  (``preferred_element_type=int32``); dequant -> bias -> relu -> requant
  are elementwise VPU work XLA fuses into the conv consumers, and
  inter-layer activations cross HBM as 1-byte int8 instead of 2-byte bf16.

Residual adds, maxpool, GAP, and the TSN consensus stay float (f32 scales,
compute-dtype accumulators) — only the MXU contractions are quantized.

Accuracy is bounded the way every program rewrite in this repo is
(CLAUDE.md convention): per-clip feature cosine vs the bf16 path plus the
PAIRED episode-accuracy delta on the canonical protocol —
tests/test_quant_infer.py, hardware twin in tests/test_tpu_hardware.py,
measured row in BASELINE.md r5.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "calibrate_act_max",
    "quantize_variables",
    "quant_feature_apply",
    "calibrate_and_quantize",
    "synthetic_calib_frames",
]

def _site_module(p, site: str):
    m = p
    for part in site.split("/"):
        m = m[part]
    return m


def _walk(p, frames, conv, *, stage_sizes, bottleneck, dtype,
          stage_override=None):
    """The folded ResNet forward with every conv routed through ``conv``.

    ``conv(site, x, stride, pad)`` returns the pre-bias conv output in
    ``dtype``; everything else (bias, relu, maxpool, residual adds, GAP)
    mirrors models/folded_infer.folded_feature_apply's XLA path exactly,
    so the calibration and quantized forwards cannot drift structurally.

    ``stage_override(i, x)`` (optional) may return the full stage-``i``
    output (replacing its per-block loop — the int8 fused stage-1 Pallas
    stack routes through this) or None to keep the per-block walk.
    """
    lead = frames.shape[:-3]
    x = frames.reshape((-1,) + frames.shape[-3:]).astype(dtype)
    x = jnp.maximum(conv("conv1", x, 2, 3) + p["bn1"]["bias"].astype(dtype), 0)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for i, n_blocks in enumerate(stage_sizes):
        if stage_override is not None:
            y = stage_override(i, x)
            if y is not None:
                x = y
                continue
        for j in range(n_blocks):
            stride = 2 if (i > 0 and j == 0) else 1
            name = f"layer{i + 1}_{j}"
            bp = p[name]
            if bottleneck:
                y = jnp.maximum(
                    conv(f"{name}/conv1", x, 1, 0)
                    + bp["bn1"]["bias"].astype(dtype), 0)
                y = jnp.maximum(
                    conv(f"{name}/conv2", y, stride, 1)
                    + bp["bn2"]["bias"].astype(dtype), 0)
                y = conv(f"{name}/conv3", y, 1, 0) \
                    + bp["bn3"]["bias"].astype(dtype)
            else:
                y = jnp.maximum(
                    conv(f"{name}/conv1", x, stride, 1)
                    + bp["bn1"]["bias"].astype(dtype), 0)
                y = conv(f"{name}/conv2", y, 1, 1) \
                    + bp["bn2"]["bias"].astype(dtype)
            if "downsample_conv" in bp:
                r = conv(f"{name}/downsample_conv", x, stride, 0) \
                    + bp["downsample_bn"]["bias"].astype(dtype)
            else:
                r = x
            x = jnp.maximum(y + r, 0)
    x = jnp.mean(x, axis=(-3, -2)).astype(jnp.float32)
    return x.reshape(lead + (x.shape[-1],))


@functools.partial(jax.jit, static_argnames=("arch",))
def calibrate_act_max(variables, frames, *, arch: str = "resnet50"):
    """f32 folded forward over ``frames`` recording max|x| per conv site.

    frames: PREPROCESSED [..., H, W, 3] float (what the backbone sees).
    Returns {site: f32 scalar} — feed to :func:`quantize_variables`.
    Multiple calibration batches: elementwise-max the returned dicts.
    """
    from eov_tpu.models import get_arch

    _, stage_sizes, bottleneck = get_arch(arch)
    p = variables["params"]
    taps: dict[str, jax.Array] = {}

    def conv(site, x, stride, pad):
        taps[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return jax.lax.conv_general_dilated(
            x, _site_module(p, site)["kernel"].astype(jnp.float32),
            (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _walk(p, frames.astype(jnp.float32), conv,
          stage_sizes=stage_sizes, bottleneck=bottleneck, dtype=jnp.float32)
    return taps


@jax.jit
def quantize_variables(variables, act_max):
    """Folded variables + calibrated activation maxima -> quantized tree.

    Every conv module {kernel} becomes {kernel_q int8 HWIO, w_scale f32[O],
    a_scale f32 scalar}; FoldedBias biases (and any fc head) pass through
    in f32.
    """
    def q_module(site, m):
        k = m["kernel"].astype(jnp.float32)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
        kq = jnp.clip(jnp.round(k / w_scale), -127, 127).astype(jnp.int8)
        a_scale = jnp.maximum(act_max[site] / 127.0, 1e-12)
        return {"kernel_q": kq, "w_scale": w_scale, "a_scale": a_scale}

    p = variables["params"]
    out: dict = {}
    for name, sub in p.items():
        if name == "conv1":
            out[name] = q_module("conv1", sub)
        elif name.startswith("layer"):
            out[name] = {
                cn: (q_module(f"{name}/{cn}", cm)
                     if isinstance(cm, dict) and "kernel" in cm else cm)
                for cn, cm in sub.items()
            }
        else:
            out[name] = sub  # bn1 bias, fc head, ...
    return {"params": out}


def _qconv(x, qm, *, stride, pad, dtype):
    """Requantize the input, int8 MXU conv to int32, dequantize."""
    a = qm["a_scale"]
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / a)), -127.0, 127.0
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, qm["kernel_q"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (a * qm["w_scale"])).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("arch", "dtype", "fused_stages", "fused_group",
                     "interpret"),
)
def quant_feature_apply(
    qvariables,
    frames: jax.Array,            # [..., H, W, 3] float (preprocessed)
    *,
    arch: str = "resnet50",
    dtype: Any = jnp.bfloat16,
    fused_stages: tuple[int, ...] = (),
    fused_group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """frames [..., H, W, 3] -> features [..., D] via the int8 forward.

    ``fused_stages=(1,)`` routes stage 1 (the only all-stride-1 stage)
    through the VMEM-resident int8 Pallas stack
    (ops/pallas_bottleneck_int8.py) — same arithmetic as this function's
    XLA conv walk (parity-tested), different memory behavior. Bottleneck
    archs only; stages 2–4 stay XLA (their strided entries, and the bf16
    stage-2 fusion precedent measured negative, BASELINE.md r2).
    """
    from eov_tpu.models import get_arch

    _, stage_sizes, bottleneck = get_arch(arch)
    p = qvariables["params"]

    if fused_stages and tuple(fused_stages) != (1,):
        raise ValueError(
            f"int8 fused_stages supports (1,) only, got {fused_stages!r}"
        )
    if fused_stages and not bottleneck:
        raise ValueError(
            "int8 fused stage-1 is implemented for bottleneck archs only "
            f"(arch={arch!r})"
        )

    def conv(site, x, stride, pad):
        return _qconv(x, _site_module(p, site),
                      stride=stride, pad=pad, dtype=dtype)

    stage_override = None
    if fused_stages:
        from eov_tpu.ops.pallas_bottleneck import _resolve_group
        from eov_tpu.ops.pallas_bottleneck_int8 import (
            fused_bottleneck_stack_int8, pack_bottleneck_params_int8,
        )

        def stage_override(i, x):  # noqa: F811 — conditional hook
            if i != 0:
                return None
            blocks = [
                pack_bottleneck_params_int8(p[f"layer1_{j}"])
                for j in range(stage_sizes[0])
            ]
            n, h, w, c = x.shape
            g = _resolve_group(fused_group, n)
            y = fused_bottleneck_stack_int8(
                x.reshape(n, h * w, c), blocks, h=h, w=w, group=g,
                interpret=interpret,
            )
            return y.reshape(n, h, w, y.shape[-1])

    return _walk(p, frames, conv,
                 stage_sizes=stage_sizes, bottleneck=bottleneck, dtype=dtype,
                 stage_override=stage_override)


def synthetic_calib_frames(
    n_clips: int, num_segments: int, height: int, width: int
) -> np.ndarray:
    """uint8 [n_clips, K, H, W, 3] deterministic calibration clips
    (data/fixtures — 6 distinct procedural classes, cycled)."""
    from eov_tpu.data.fixtures import synthetic_clip

    return np.stack([
        synthetic_clip(i % 6, i // 6, num_segments, height, width)
        for i in range(n_clips)
    ])


def calibrate_and_quantize(
    variables,
    calib_frames: jax.Array,      # PREPROCESSED [..., H, W, 3] float
    *,
    arch: str = "resnet50",
):
    """One-shot: calibrate activation scales on ``calib_frames`` and return
    the quantized variable tree for :func:`quant_feature_apply`."""
    act_max = calibrate_act_max(variables, calib_frames, arch=arch)
    return quantize_variables(variables, act_max)
