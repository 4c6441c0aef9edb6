"""Training-mode fused ResNet bottleneck stack with a custom VJP.

Capability parity: reference component C12's hot loop (SURVEY.md §3.5 —
the TSN finetune forward+backward). The r3 train-step trace (DESIGN.md
§9b) put 55.6% of device time in backward convs, with stage-1/2 1x1-conv
transposes running at 2-8% MXU: the dgrad of a Cmid=64 conv contracts
over K=64 (half the MXU lanes wasted) on 56x56 maps that are already
HBM-roofline-bound, and the wgrad is a tall-skinny [P,256]^T @ [P,64]
reduction. The same VMEM-residency trick that won the inference path
(ops/pallas_bottleneck.py) applies to training — but needs a hand-written
backward, because autodiff of a Pallas forward is not available.

Design:
* ``bottleneck_stack_train(x, blocks, ...)`` is a ``jax.custom_vjp`` op
  over a whole stride-1 bottleneck stack (ResNet-50 stage 1: 3 blocks)
  with FROZEN BatchNorm (TSN partial_bn: every stage BN uses running
  statistics, so each BN is a constant per-channel affine s*y + b).
* Forward: the blocks run per image fully VMEM-resident (activation maps
  enter/leave HBM once). Only the stack INPUT is saved for backward.
* Backward: recompute-in-kernel (jax.checkpoint style, but inside VMEM):
  the forward chain is recomputed from the saved input — the recompute is
  pure MXU work on maps that never touch HBM — then gradients flow back
  through the three blocks, producing dx and per-conv weight gradients
  (dW accumulated across the image grid in f32 output refs). The frozen
  affines get zero gradients (their grads are optimizer-masked to zero
  anyway — train.py's TSN policy).
* Numerics mirror the flax path (models/resnet.py Bottleneck with frozen
  BN): conv outputs round to the compute dtype, affine+ReLU run in f32,
  the residual adds in f32. The pure-JAX reference implementations below
  are the semantics oracle; the Pallas kernels are parity-tested against
  them (interpret mode on CPU, compiled on TPU), and the custom VJP is
  parity-tested against jax.grad of the reference forward.

Weight layout per block (``pack_train_block``): conv kernels stay the
trainable f32 parameters (w1 [Cin,Cmid], w2 [9,Cmid,Cmid] tap-major,
w3 [Cmid,Cout], optional wd [Cin,Cout]); the frozen-BN affines fold into
constant (s, b) pairs per conv.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_train_block", "bottleneck_stack_train"]


def pack_train_block(
    params_block: Mapping[str, Any],
    stats_block: Mapping[str, Any],
    eps: float = 1e-5,
) -> dict:
    """One layerI_J param+stats subtree -> the op's block dict.

    Frozen BN (running stats) is the constant affine
    ``y*s + b`` with s = scale/sqrt(var+eps), b = bias - mean*s.
    Conv kernels pass through unchanged (they are the trainable leaves —
    gradients flow to exactly these arrays).
    """

    def affine(name):
        bn, st = params_block[name], stats_block[name]
        s = bn["scale"] / jnp.sqrt(st["var"] + eps)
        return s, bn["bias"] - st["mean"] * s

    w2 = params_block["conv2"]["kernel"]  # [3, 3, Cmid, Cmid]
    out = {
        "w1": params_block["conv1"]["kernel"][0, 0],
        "w2": w2.reshape(9, w2.shape[2], w2.shape[3]),
        "w3": params_block["conv3"]["kernel"][0, 0],
    }
    out["s1"], out["b1"] = affine("bn1")
    out["s2"], out["b2"] = affine("bn2")
    out["s3"], out["b3"] = affine("bn3")
    if "downsample_conv" in params_block:
        out["wd"] = params_block["downsample_conv"]["kernel"][0, 0]
        out["sd"], out["bd"] = affine("downsample_bn")
    return out


# ---------------------------------------------------------------------------
# Pure-JAX reference (semantics oracle; also the off-TPU execution path).
# ---------------------------------------------------------------------------


def _conv3x3_flat(y: jax.Array, w2: jax.Array, h: int, w: int) -> jax.Array:
    """3x3 same-pad conv on flat [P, C] rows via 9 shifted matmuls (f32 acc).

    Mirrors the inference kernel's formulation so the Pallas twin is
    op-for-op identical: neighbor (dy, dx) of flat pixel k is row
    k + dy*w + dx in a zero-row-padded buffer; horizontal wrap-around is
    masked by column predicates.
    """
    p = h * w
    cmid = y.shape[-1]
    pad = jnp.zeros((w + 1, cmid), y.dtype)
    ybuf = jnp.concatenate([pad, y, pad], axis=0)  # [P + 2w + 2, C]
    col = (jnp.arange(p) % w)[:, None]
    mask_l = (col != 0).astype(y.dtype)
    mask_r = (col != w - 1).astype(y.dtype)
    acc = jnp.zeros((p, w2.shape[-1]), jnp.float32)
    s = w + 1
    for ky in range(3):
        for kx in range(3):
            off = s + (ky - 1) * w + (kx - 1)
            tap = jax.lax.dynamic_slice_in_dim(ybuf, off, p, axis=0)
            if kx == 0:
                tap = tap * mask_l
            elif kx == 2:
                tap = tap * mask_r
            acc = acc + jax.lax.dot_general(
                tap, w2[ky * 3 + kx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return acc


def _block_forward_ref(x, b, *, h, w, dtype):
    """One bottleneck block, flax-faithful rounding. x: [P, Cin] f32."""

    def mm(a, w_):
        return jax.lax.dot_general(
            a, w_, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xd = x.astype(dtype)
    c1 = mm(xd, b["w1"].astype(dtype)).astype(dtype)          # conv out, D
    y1 = jnp.maximum(c1.astype(jnp.float32) * b["s1"] + b["b1"], 0.0)
    y1d = y1.astype(dtype)
    c2 = _conv3x3_flat(y1d, b["w2"].astype(dtype), h, w).astype(dtype)
    y2 = jnp.maximum(c2.astype(jnp.float32) * b["s2"] + b["b2"], 0.0)
    y2d = y2.astype(dtype)
    c3 = mm(y2d, b["w3"].astype(dtype)).astype(dtype)
    z3 = c3.astype(jnp.float32) * b["s3"] + b["b3"]
    if "wd" in b:
        cd = mm(xd, b["wd"].astype(dtype)).astype(dtype)
        r = cd.astype(jnp.float32) * b["sd"] + b["bd"]
    else:
        r = x
    return jnp.maximum(z3 + r, 0.0)


def _stack_forward_ref(x, blocks, *, h, w, dtype):
    """Reference forward for the whole stack. x: [N, P, Cin] f32."""

    def per_image(xi):
        for b in blocks:
            xi = _block_forward_ref(xi, b, h=h, w=w, dtype=dtype)
        return xi

    return jax.vmap(per_image)(x)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def bottleneck_stack_train(
    x: jax.Array,                     # [N, P, Cin] float32
    blocks: Sequence[Mapping[str, jax.Array]],
    h: int,
    w: int,
    dtype_name: str = "bfloat16",
    use_pallas: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Frozen-BN bottleneck stack, VMEM-fused forward+backward on TPU.

    Differentiable w.r.t. x and every conv kernel in ``blocks`` (w1, w2,
    w3, wd); the affine (s, b) entries receive zero gradients (frozen BN).
    ``dtype_name`` is the compute dtype; activations cross the op boundary
    in f32 (matching the flax train path's inter-block dtype).
    """
    dtype = jnp.dtype(dtype_name)
    if use_pallas:
        return _fwd_pallas(x, blocks, h=h, w=w, dtype=dtype,
                           interpret=interpret)
    return _stack_forward_ref(x, blocks, h=h, w=w, dtype=dtype)


def _stack_fwd(x, blocks, h, w, dtype_name, use_pallas, interpret):
    y = bottleneck_stack_train(
        x, blocks, h, w, dtype_name, use_pallas, interpret
    )
    return y, (x, blocks)


def _stack_bwd(h, w, dtype_name, use_pallas, interpret, res, dy):
    x, blocks = res
    dtype = jnp.dtype(dtype_name)
    if use_pallas:
        dx, dws = _bwd_pallas(
            x, blocks, dy, h=h, w=w, dtype=dtype, interpret=interpret
        )
    else:
        dx, dws = _bwd_ref(x, blocks, dy, h=h, w=w, dtype=dtype)
    dblocks = []
    for b, dwb in zip(blocks, dws):
        db = {k: jnp.zeros_like(v) for k, v in b.items()}
        db.update(dwb)
        dblocks.append(db)
    return dx, dblocks  # cotangents for (x, blocks)


bottleneck_stack_train.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------------
# Reference backward (hand-derived; oracle-tested vs jax.grad of the ref fwd)
# ---------------------------------------------------------------------------


def _conv3x3_flat_dgrad(g, w2, h, w):
    """d/dy of _conv3x3_flat at grad g: transposed 3x3 conv, flat rows.

    dy[q] = sum_t (g * mask_t)[q - o_t] @ w2[t]^T  — premask g per dx
    variant, pad, read with negated offsets.
    """
    p = h * w
    cmid = w2.shape[1]
    col = (jnp.arange(p) % w)[:, None]
    mask_l = (col != 0).astype(g.dtype)
    mask_r = (col != w - 1).astype(g.dtype)
    pad = jnp.zeros((w + 1, w2.shape[-1]), g.dtype)
    bufs = {
        0: jnp.concatenate([pad, g * mask_l, pad], axis=0),
        1: jnp.concatenate([pad, g, pad], axis=0),
        2: jnp.concatenate([pad, g * mask_r, pad], axis=0),
    }
    s = w + 1
    dy = jnp.zeros((p, cmid), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = s - (ky - 1) * w - (kx - 1)
            tap = jax.lax.dynamic_slice_in_dim(bufs[kx], off, p, axis=0)
            dy = dy + jax.lax.dot_general(
                tap, w2[ky * 3 + kx],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return dy


def _conv3x3_flat_wgrad(y1, g, h, w):
    """dW2[t] = masked_tap_t(y1)^T @ g for each of the 9 taps."""
    p = h * w
    col = (jnp.arange(p) % w)[:, None]
    mask_l = (col != 0).astype(y1.dtype)
    mask_r = (col != w - 1).astype(y1.dtype)
    pad = jnp.zeros((w + 1, y1.shape[-1]), y1.dtype)
    ybuf = jnp.concatenate([pad, y1, pad], axis=0)
    s = w + 1
    taps = []
    for ky in range(3):
        for kx in range(3):
            off = s + (ky - 1) * w + (kx - 1)
            tap = jax.lax.dynamic_slice_in_dim(ybuf, off, p, axis=0)
            if kx == 0:
                tap = tap * mask_l
            elif kx == 2:
                tap = tap * mask_r
            taps.append(jax.lax.dot_general(
                tap, g, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    return jnp.stack(taps)  # [9, Cmid, Cmid]


def _block_bwd_ref(x, b, d_out, *, h, w, dtype):
    """Backward of one block. x [P,Cin] f32, d_out [P,Cout] f32.

    Returns (dx [P,Cin] f32, weight grads dict). Recomputes the forward
    intermediates (the kernel twin keeps them in VMEM).
    """

    def mm(a, w_, tn=None):
        dn = tn or (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(
            a, w_, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    # --- recompute forward intermediates ---
    xd = x.astype(dtype)
    c1 = mm(xd, b["w1"].astype(dtype)).astype(dtype)
    y1 = jnp.maximum(c1.astype(jnp.float32) * b["s1"] + b["b1"], 0.0)
    y1d = y1.astype(dtype)
    c2 = _conv3x3_flat(y1d, b["w2"].astype(dtype), h, w).astype(dtype)
    y2 = jnp.maximum(c2.astype(jnp.float32) * b["s2"] + b["b2"], 0.0)
    y2d = y2.astype(dtype)
    c3 = mm(y2d, b["w3"].astype(dtype)).astype(dtype)
    z3 = c3.astype(jnp.float32) * b["s3"] + b["b3"]
    if "wd" in b:
        cd = mm(xd, b["wd"].astype(dtype)).astype(dtype)
        r = cd.astype(jnp.float32) * b["sd"] + b["bd"]
    else:
        r = x
    out_pos = (z3 + r) > 0.0

    # --- backward ---
    d_pre = d_out * out_pos.astype(d_out.dtype)         # [P, Cout] f32
    g3 = (d_pre * b["s3"]).astype(dtype)
    dw3 = mm(y2d, g3, (((0,), (0,)), ((), ())))          # [Cmid, Cout]
    dy2 = mm(g3, b["w3"].astype(dtype), (((1,), (1,)), ((), ())))
    dy2 = dy2 * (y2 > 0.0).astype(jnp.float32)
    g2 = (dy2 * b["s2"]).astype(dtype)
    dw2 = _conv3x3_flat_wgrad(y1d, g2, h, w)
    dy1 = _conv3x3_flat_dgrad(g2, b["w2"].astype(dtype), h, w)
    dy1 = dy1 * (y1 > 0.0).astype(jnp.float32)
    g1 = (dy1 * b["s1"]).astype(dtype)
    dw1 = mm(xd, g1, (((0,), (0,)), ((), ())))           # [Cin, Cmid]
    dx = mm(g1, b["w1"].astype(dtype), (((1,), (1,)), ((), ())))
    dws = {"w1": dw1, "w2": dw2, "w3": dw3}
    if "wd" in b:
        gd = (d_pre * b["sd"]).astype(dtype)
        dws["wd"] = mm(xd, gd, (((0,), (0,)), ((), ())))
        dx = dx + mm(gd, b["wd"].astype(dtype), (((1,), (1,)), ((), ())))
    else:
        dx = dx + d_pre
    return dx, dws


def _bwd_ref(x, blocks, dy, *, h, w, dtype):
    """Reference backward for the stack (vmapped over images)."""

    def per_image(xi, dyi):
        # recompute the block inputs
        xs = [xi]
        for b in blocks[:-1]:
            xs.append(_block_forward_ref(xs[-1], b, h=h, w=w, dtype=dtype))
        d = dyi
        dws_rev = []
        for b, xb in zip(reversed(blocks), reversed(xs)):
            d, dwb = _block_bwd_ref(xb, b, d, h=h, w=w, dtype=dtype)
            dws_rev.append(dwb)
        return d, list(reversed(dws_rev))

    dx, dws = jax.vmap(per_image)(x, dy)
    # weight grads sum over the image axis
    dws = jax.tree.map(lambda a: jnp.sum(a, axis=0), dws)
    return dx, dws


# ---------------------------------------------------------------------------
# Pallas kernels (TPU fast path; interpret mode for CPU parity)
# ---------------------------------------------------------------------------


def _flatten_block_params(blocks, dtype):
    """blocks -> (flat list of arrays, per-array specs builder data)."""
    flat, descr = [], []
    for b in blocks:
        names = ("w1", "s1", "b1", "w2", "s2", "b2", "w3", "s3", "b3")
        if "wd" in b:
            names += ("wd", "sd", "bd")
        for k in names:
            arr = b[k]
            if k[0] == "w":
                arr = arr.astype(dtype)
            else:
                arr = arr.astype(jnp.float32).reshape(1, -1)
            flat.append(arr)
            descr.append((k, arr.shape))
    return flat, descr


def _fwd_kernel(*refs, n_blocks, has_proj, h, w, dtype):
    """Forward: x_ref [1,P,Cin] f32 -> out_ref [1,P,Cout] f32."""
    x_ref = refs[0]
    out_ref = refs[-2]
    pad_ref = refs[-1]
    p = h * w
    s = w + 1
    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
    mask_l = (col != 0).astype(dtype)
    mask_r = (col != w - 1).astype(dtype)

    def mm(a, b_, tn=None):
        dn = tn or (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(
            a, b_, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    xf = x_ref[0]  # [P, Cin] f32
    ri = 1
    for bi in range(n_blocks):
        proj = has_proj[bi]
        n_par = 12 if proj else 9
        pr = refs[ri : ri + n_par]
        ri += n_par
        w1, s1, b1, w2, s2, b2, w3, s3, b3 = (r[...] for r in pr[:9])
        if proj:
            wd, sd, bd = (r[...] for r in pr[9:])
        xd = xf.astype(dtype)
        c1 = mm(xd, w1).astype(dtype)
        y1 = jnp.maximum(c1.astype(jnp.float32) * s1 + b1, 0.0)
        pad_ref[0, s : s + p] = y1.astype(dtype)
        acc = jnp.zeros((p, w2.shape[-1]), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                tap = pad_ref[0, off : off + p]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                acc = acc + mm(tap, w2[ky * 3 + kx])
        c2 = acc.astype(dtype)
        y2 = jnp.maximum(c2.astype(jnp.float32) * s2 + b2, 0.0)
        c3 = mm(y2.astype(dtype), w3).astype(dtype)
        z3 = c3.astype(jnp.float32) * s3 + b3
        if proj:
            cd = mm(xd, wd).astype(dtype)
            r_ = cd.astype(jnp.float32) * sd + bd
        else:
            r_ = xf
        xf = jnp.maximum(z3 + r_, 0.0)
    out_ref[0] = xf


def _fwd_pallas(x, blocks, *, h, w, dtype, interpret):
    n, p, cin = x.shape
    cout = blocks[-1]["w3"].shape[-1]
    cmid = blocks[0]["w2"].shape[-1]
    has_proj = tuple("wd" in b for b in blocks)
    flat, descr = _flatten_block_params(blocks, dtype)
    in_specs = [pl.BlockSpec((1, p, cin), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for _, shape in descr:
        in_specs.append(pl.BlockSpec(
            shape, lambda i, nd=len(shape): (0,) * nd,
            memory_space=pltpu.VMEM,
        ))
    kernel = functools.partial(
        _fwd_kernel, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, (h + 2) * w + 8, cmid), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *flat)


def _bwd_kernel(*refs, n_blocks, has_proj, h, w, dtype, n_params, n_dw):
    """Backward: recompute the forward per image, then reverse the blocks.

    Ref layout: x [1,P,Cin] f32, dy [1,P,Cout] f32, <n_params block param
    refs>, dx [1,P,Cin] f32, <n_dw f32 dW refs, grid-accumulated>,
    pad_y (y1 taps) and pad_g (g2 taps) scratch.

    dgrad masking note: the forward tap (ky, kx) reads the y1 pad at
    offset +o with mask m_kx evaluated at the OUTPUT position; its
    transpose reads the g2 pad at offset -o with the MIRRORED mask
    (m_l <-> m_r), because col(q - o) = col(q) - (kx - 1) mod w.
    """
    x_ref, dy_ref = refs[0], refs[1]
    param_refs = refs[2 : 2 + n_params]
    dx_ref = refs[2 + n_params]
    dw_refs = refs[3 + n_params : 3 + n_params + n_dw]
    pad_y, pad_g = refs[-2], refs[-1]
    p = h * w
    s = w + 1
    i = pl.program_id(0)

    pad_y[:] = jnp.zeros(pad_y.shape, pad_y.dtype)
    pad_g[:] = jnp.zeros(pad_g.shape, pad_g.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
    mask_l = (col != 0).astype(dtype)
    mask_r = (col != w - 1).astype(dtype)

    def mm(a, b_, tn=None):
        dn = tn or (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(
            a, b_, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    # unpack per-block param refs + per-block dW ref offsets
    blocks, dw_offs, ri, di = [], [], 0, 0
    for bi in range(n_blocks):
        n_par = 12 if has_proj[bi] else 9
        blocks.append(param_refs[ri : ri + n_par])
        ri += n_par
        dw_offs.append(di)
        di += 4 if has_proj[bi] else 3

    # --- recompute forward, keeping intermediates as VMEM values ---
    xs, y1s, y2s, outs = [], [], [], []
    xf = x_ref[0]
    for bi in range(n_blocks):
        pr = blocks[bi]
        w1, s1, b1, w2, s2, b2, w3, s3, b3 = (r[...] for r in pr[:9])
        proj = has_proj[bi]
        if proj:
            wd, sd, bd = (r[...] for r in pr[9:])
        xs.append(xf)
        xd = xf.astype(dtype)
        c1 = mm(xd, w1).astype(dtype)
        y1 = jnp.maximum(c1.astype(jnp.float32) * s1 + b1, 0.0)
        y1d = y1.astype(dtype)
        pad_y[0, s : s + p] = y1d
        acc = jnp.zeros((p, w2.shape[-1]), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                tap = pad_y[0, off : off + p]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                acc = acc + mm(tap, w2[ky * 3 + kx])
        c2 = acc.astype(dtype)
        y2 = jnp.maximum(c2.astype(jnp.float32) * s2 + b2, 0.0)
        c3 = mm(y2.astype(dtype), w3).astype(dtype)
        z3 = c3.astype(jnp.float32) * s3 + b3
        if proj:
            cd = mm(xd, wd).astype(dtype)
            r_ = cd.astype(jnp.float32) * sd + bd
        else:
            r_ = xf
        out = jnp.maximum(z3 + r_, 0.0)
        y1s.append(y1)
        y2s.append(y2)
        outs.append(out)
        xf = out

    # --- zero-init the dW accumulators on the first grid step ---
    @pl.when(i == 0)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    # --- reverse pass ---
    d = dy_ref[0]  # [P, Cout] f32
    for bi in range(n_blocks - 1, -1, -1):
        pr = blocks[bi]
        w1, s1, b1, w2, s2, b2, w3, s3, b3 = (r[...] for r in pr[:9])
        proj = has_proj[bi]
        if proj:
            wd, sd, bd = (r[...] for r in pr[9:])
        o = dw_offs[bi]
        xb, y1, y2, out = xs[bi], y1s[bi], y2s[bi], outs[bi]
        xd = xb.astype(dtype)
        y1d = y1.astype(dtype)
        y2d = y2.astype(dtype)

        d_pre = d * (out > 0.0).astype(jnp.float32)
        g3 = (d_pre * s3).astype(dtype)
        dw_refs[o + 2][...] += mm(y2d, g3, (((0,), (0,)), ((), ())))
        dy2 = mm(g3, w3, (((1,), (1,)), ((), ())))
        dy2 = dy2 * (y2 > 0.0).astype(jnp.float32)
        g2 = (dy2 * s2).astype(dtype)

        pad_y[0, s : s + p] = y1d
        pad_g[0, s : s + p] = g2
        dy1 = jnp.zeros((p, w2.shape[1]), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                tap = pad_y[0, off : off + p]
                if kx == 0:
                    tap = tap * mask_l
                elif kx == 2:
                    tap = tap * mask_r
                dw_refs[o + 1][ky * 3 + kx] += mm(
                    tap, g2, (((0,), (0,)), ((), ()))
                )
                btap = pad_g[0, 2 * s - off : 2 * s - off + p]
                if kx == 0:
                    btap = btap * mask_r  # mirrored (see docstring)
                elif kx == 2:
                    btap = btap * mask_l
                dy1 = dy1 + mm(btap, w2[ky * 3 + kx],
                               (((1,), (1,)), ((), ())))
        dy1 = dy1 * (y1 > 0.0).astype(jnp.float32)
        g1 = (dy1 * s1).astype(dtype)
        dw_refs[o][...] += mm(xd, g1, (((0,), (0,)), ((), ())))
        dxb = mm(g1, w1, (((1,), (1,)), ((), ())))
        if proj:
            gd = (d_pre * sd).astype(dtype)
            dw_refs[o + 3][...] += mm(xd, gd, (((0,), (0,)), ((), ())))
            dxb = dxb + mm(gd, wd, (((1,), (1,)), ((), ())))
        else:
            dxb = dxb + d_pre
        d = dxb
    dx_ref[0] = d


def _bwd_pallas(x, blocks, dy, *, h, w, dtype, interpret):
    """Pallas backward: returns (dx [N,P,Cin] f32, per-block dW dicts)."""
    n, p, cin = x.shape
    cout = blocks[-1]["w3"].shape[-1]
    cmid = blocks[0]["w2"].shape[-1]
    has_proj = tuple("wd" in b for b in blocks)
    flat, descr = _flatten_block_params(blocks, dtype)

    in_specs = [
        pl.BlockSpec((1, p, cin), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for _, shape in descr:
        in_specs.append(pl.BlockSpec(
            shape, lambda i, nd=len(shape): (0,) * nd,
            memory_space=pltpu.VMEM,
        ))

    # dW outputs: f32, constant index map (accumulated across the grid).
    dw_shapes, dw_specs = [], []
    for b in blocks:
        for k in ("w1", "w2", "w3") + (("wd",) if "wd" in b else ()):
            shape = b[k].shape
            dw_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            dw_specs.append(pl.BlockSpec(
                shape, lambda i, nd=len(shape): (0,) * nd,
                memory_space=pltpu.VMEM,
            ))

    kernel = functools.partial(
        _bwd_kernel, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, dtype=dtype, n_params=len(flat), n_dw=len(dw_shapes),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, p, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + dw_specs,
        out_shape=[jax.ShapeDtypeStruct((n, p, cin), jnp.float32)]
        + dw_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, (h + 2) * w + 8, cmid), dtype),
            pltpu.VMEM((1, (h + 2) * w + 8, cmid), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, dy, *flat)
    dx, dw_flat = out[0], list(out[1:])
    dws, di = [], 0
    for b in blocks:
        names = ("w1", "w2", "w3") + (("wd",) if "wd" in b else ())
        dws.append({k: dw_flat[di + j] for j, k in enumerate(names)})
        di += len(names)
    return dx, dws
