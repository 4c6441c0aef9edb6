"""Pallas TPU kernel: VMEM-resident int8 fused ResNet bottleneck stack.

Capability row: SURVEY.md §2a C4 (backbone hot loop) on BASELINE.json:5's
throughput axis — the int8 composition of the two measured r2–r5 levers:

* ops/pallas_bottleneck.py (bf16 fused stage-1: each activation map
  enters/leaves HBM once, the stage turns compute-bound — production
  since r2), and
* models/quant_infer.py (post-training int8: s8×s8→s32 MXU convs,
  +17.8% end-to-end over bf16 in r5, BASELINE.md).

The r5 xprof attribution of the int8 XLA path showed stage-1 still
bandwidth-bound (its inter-conv activations round-trip HBM exactly as the
bf16 unfused path's did). This kernel runs the whole stride-1 int8
bottleneck stack per image group in VMEM, mirroring the quantized XLA
walk (quant_infer._walk + _qconv) op for op:

    per conv:  xq = clip(round(x_bf16 · inv_a), ±127) → int8
               acc = dot(xq, wq) int8×int8→int32  (MXU)
               y   = bf16(acc_f32 · (a·w_scale)[out])   (dequant)
    per block: relu(y1+b1) → 3×3 as 9 shifted int8 matmuls over an int8
               pad scratch → relu(y2+b2) → 1×1 → +residual (+projection
               on the entry block) → relu

Dequant/requant chains are ordered exactly as the XLA path orders them
(including the intermediate bf16 rounding of each conv output), so the
kernel is BITWISE-comparable to quant_feature_apply at every block
boundary up to f32 elementwise determinism — parity-tested in
tests/test_pallas_bottleneck.py (interpret) and compiled on hardware in
tests/test_tpu_hardware.py. The int8 taps halve the pad-scratch bytes and
the 3×3's VMEM read traffic vs the bf16 kernel; the MXU contractions run
at the chip's int8 rate. Whether that beats the int8 XLA walk end-to-end
is a measurement (BASELINE.md r5), not a declaration.

Mosaic-lowering preconditions (all probed on hardware first —
artifacts/r5_int8_probe.py): s8×s8→s32 dot_general, i32→f32 and
f32→round→clip→i8 casts, unaligned static row-slices of an int8 (32,128)-
tiled scratch, int8 edge-mask multiplies.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_bottleneck_stack_int8",
    "pack_bottleneck_params_int8",
]


def pack_bottleneck_params_int8(qblock_tree: Mapping[str, Any]) -> dict:
    """Quantized block param tree -> the flat arrays the kernel consumes.

    qblock_tree is one ``layerI_J`` subtree of quant_infer.quantize_variables
    output: conv modules {kernel_q int8 [kh,kw,ci,co], w_scale f32 [co],
    a_scale f32 scalar} + FoldedBias biases [c].

    Per conv site the kernel wants:
      wq       int8  [ci, co] (1×1) / [9, ci, co] (3×3 tap-major)
      scale    f32   [1, co]   = a_scale · w_scale  (dequant multiplier —
                                 the same product the XLA path forms)
      inv_a    f32   [1, 1]    = 1 / a_scale        (requant multiplier)
    plus the block's FoldedBias biases [1, c] (f32, cast in-kernel).
    """
    def site(m):
        kq = m["kernel_q"]
        if kq.shape[0] == 1 and kq.shape[1] == 1:
            wq = kq[0, 0]
        else:
            wq = kq.reshape(9, kq.shape[2], kq.shape[3])
        a = m["a_scale"].astype(jnp.float32)
        return {
            "wq": wq,
            "scale": (a * m["w_scale"].astype(jnp.float32))[None, :],
            "inv_a": (1.0 / a).reshape(1, 1),
        }

    s1 = site(qblock_tree["conv1"])
    s2 = site(qblock_tree["conv2"])
    s3 = site(qblock_tree["conv3"])
    out = {
        "w1": s1["wq"], "s1": s1["scale"], "q1": s1["inv_a"],
        "b1": qblock_tree["bn1"]["bias"][None, :],
        "w2": s2["wq"], "s2": s2["scale"], "q2": s2["inv_a"],
        "b2": qblock_tree["bn2"]["bias"][None, :],
        "w3": s3["wq"], "s3": s3["scale"], "q3": s3["inv_a"],
        "b3": qblock_tree["bn3"]["bias"][None, :],
    }
    if "downsample_conv" in qblock_tree:
        sd = site(qblock_tree["downsample_conv"])
        out.update({
            "wd": sd["wq"], "sd": sd["scale"], "qd": sd["inv_a"],
            "bd": qblock_tree["downsample_bn"]["bias"][None, :],
        })
    return out


# Canonical per-block ref order (positional kernel consumption).
_KEYS = ("w1", "s1", "q1", "b1", "w2", "s2", "q2", "b2",
         "w3", "s3", "q3", "b3")
_KEYS_PROJ = _KEYS + ("wd", "sd", "qd", "bd")


def _run_chain_int8(xs, refs, out_ref, pad_ref, *, n_blocks, has_proj,
                    h, w, dtype, group):
    """Op-interleaved int8 block chain over a list of [P, Cin] bf16 images.

    Mirrors pallas_bottleneck._run_chain's interleave structure; the
    arithmetic per conv mirrors quant_infer._qconv exactly (see module
    doc). The pad scratch holds the REQUANTIZED int8 conv2 input.
    """
    p = h * w
    s = w + 1

    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    # Edge masks as SELECTS, not multiplies: Mosaic has no vector i8
    # arith.muli on this hardware (probed — artifacts/r5_int8_probe.py
    # case i8_mask_mul fails to legalize; the select lowers).
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
    mask_l = col != 0
    mask_r = col != w - 1

    def imm(a, b):
        """int8 × int8 → int32 MXU matmul."""
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def quant(x, inv_a):
        """bf16/f32 activation → int8 at scale a (XLA _qconv's requant)."""
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_a), -127.0, 127.0)
        return q.astype(jnp.int8)

    def dequant(acc, scale):
        """int32 accumulator → conv output in compute dtype."""
        return (acc.astype(jnp.float32) * scale).astype(dtype)

    ri = 1
    for bi in range(n_blocks):
        proj = has_proj[bi]
        keys = _KEYS_PROJ if proj else _KEYS
        vals = {k: refs[ri + i][...] for i, k in enumerate(keys)}
        ri += len(keys)
        b1 = vals["b1"].astype(dtype)
        b2 = vals["b2"].astype(dtype)
        b3 = vals["b3"].astype(dtype)

        # conv1 1×1: requant block input, int8 matmul, dequant+bias+relu,
        # then requant at conv2's scale into the padded int8 scratch.
        y1q = []
        for g in range(group):
            xq = quant(xs[g], vals["q1"][0, 0])
            y1 = jnp.maximum(dequant(imm(xq, vals["w1"]), vals["s1"]) + b1, 0)
            y1q.append(quant(y1, vals["q2"][0, 0]))
        for g in range(group):
            pad_ref[g, s : s + p] = y1q[g]

        # conv2 3×3 as 9 shifted int8 matmuls (edge masks in int8).
        accs = [jnp.zeros((p, vals["w2"].shape[-1]), jnp.int32)] * group
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                for g in range(group):
                    tap = pad_ref[g, off : off + p]
                    if kx == 0:
                        tap = jnp.where(mask_l, tap, jnp.int8(0))
                    elif kx == 2:
                        tap = jnp.where(mask_r, tap, jnp.int8(0))
                    accs[g] = accs[g] + imm(tap, vals["w2"][ky * 3 + kx])
        y2s = [
            jnp.maximum(dequant(accs[g], vals["s2"]) + b2, 0)
            for g in range(group)
        ]

        # conv3 1×1 (+ projected residual on the entry block) + relu.
        for g in range(group):
            y3 = dequant(imm(quant(y2s[g], vals["q3"][0, 0]), vals["w3"]),
                         vals["s3"]) + b3
            if proj:
                bd = vals["bd"].astype(dtype)
                r = dequant(
                    imm(quant(xs[g], vals["qd"][0, 0]), vals["wd"]),
                    vals["sd"],
                ) + bd
            else:
                r = xs[g]
            xs[g] = jnp.maximum(y3 + r, 0).astype(dtype)

    for g in range(group):
        out_ref[g] = xs[g]


def _stack_kernel_int8(*refs, n_blocks, has_proj, h, w, dtype, group):
    xs = [refs[0][g] for g in range(group)]
    _run_chain_int8(
        xs, refs, refs[-2], refs[-1], n_blocks=n_blocks, has_proj=has_proj,
        h=h, w=w, dtype=dtype, group=group,
    )


def _flat_params_and_specs_int8(blocks):
    flat_params, in_specs = [], []
    for b in blocks:
        keys = _KEYS_PROJ if ("wd" in b or "bd" in b) else _KEYS
        missing = [k for k in keys if k not in b]
        if missing:
            raise KeyError(f"int8 block is missing kernel params {missing}")
        for k in keys:
            arr = b[k]
            if k[0] == "w":
                arr = arr.astype(jnp.int8)
            else:
                arr = arr.astype(jnp.float32)
            flat_params.append(arr)
            in_specs.append(
                pl.BlockSpec(
                    arr.shape,
                    lambda i, nd=arr.ndim: (0,) * nd,
                    memory_space=pltpu.VMEM,
                )
            )
    return flat_params, in_specs


@functools.partial(
    jax.jit, static_argnames=("h", "w", "group", "interpret")
)
def fused_bottleneck_stack_int8(
    x: jax.Array,                      # [N, H*W, Cin] compute-dtype (bf16)
    blocks: Sequence[Mapping[str, jax.Array]],  # pack_bottleneck_params_int8
    *,
    h: int,
    w: int,
    group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Run a stride-1 int8 bottleneck stack fully VMEM-resident per group.

    Returns [N, H*W, Cout] in x.dtype. Semantics: quant_feature_apply's
    XLA walk over the same blocks (block 0 may carry a projection; all
    spatial strides must be 1 — true for stage 1). ``group`` images
    interleave op-by-op per grid step, bit-identical per image.
    """
    from eov_tpu.ops.pallas_bottleneck import _resolve_group

    n, p, cin = x.shape
    if p != h * w:
        raise ValueError(f"x rows {p} != h*w {h * w}")
    g = _resolve_group(group, n)
    dtype = x.dtype
    cmid = blocks[0]["w2"].shape[-1]
    cout = blocks[-1]["w3"].shape[-1]
    has_proj = tuple("wd" in b for b in blocks)
    if not has_proj[0] and cin != cout:
        raise ValueError("first block needs a projection when Cin != Cout")

    flat_params, in_specs = _flat_params_and_specs_int8(blocks)
    in_specs.insert(0, pl.BlockSpec((g, p, cin), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _stack_kernel_int8, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, dtype=dtype, group=g,
    )
    # FLOPs: count MACs×2 like the bf16 kernel (MXU int8 ops; the analytic
    # rail stays bf16-equivalent so MFU numbers compare across variants).
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
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, cout), dtype),
        # int8 pad scratch (half the bf16 kernel's bytes) + 8 rows slack.
        scratch_shapes=[pltpu.VMEM((g, (h + 2) * w + 8, cmid), jnp.int8)],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if g > 1 else None
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_per_img,
            bytes_accessed=bytes_io,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *flat_params)
