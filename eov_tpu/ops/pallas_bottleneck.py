"""Pallas TPU kernel: VMEM-resident fused ResNet bottleneck stack.

The r1 roofline (DESIGN.md §9) put ~25% of extraction device time in the
stage-1/2 1x1 convs at ~17 TFLOP/s — HBM-bound: XLA round-trips every
56x56 activation map to HBM between convs. This kernel runs a whole stack
of stride-1 bottleneck blocks (conv1 1x1 -> conv2 3x3 -> conv3 1x1 +
residual, folded-BN biases, ReLUs) for a small GROUP of images per grid
step entirely in VMEM: each map enters HBM once ([H*W, Cin]) and leaves
once ([H*W, Cout]). At ResNet-50 stage 1 that replaces ~20 MB of per-image
HBM traffic with ~2 MB, turning a bandwidth-bound stage into a
compute-bound one.

Why a group (r2 follow-up): with one image per grid step the kernel body
is a single serial dependency chain, so its VPU work (bias+ReLU+cast,
edge masks, scratch stores — ~1/3 of kernel time at stage-1 shapes)
serializes against the MXU matmuls. Interleaving ``group`` independent
images op-by-op in one body gives Mosaic's static scheduler co-resident
independent chains, letting VPU work of one image hide under another's
matmuls (and amortizing weight loads). Per-image math is bit-identical
for every group size.

Design notes (TPU/Mosaic-safe by construction):
* Everything is 2-D [rows, channels] per image — channels on the 128-lane
  axis, pixels on sublanes. No in-kernel reshapes of tiled dims: the
  caller passes activations flattened to [N, H*W, C].
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
  double-buffers only the per-group input/output blocks.

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

__all__ = [
    "fused_bottleneck_stack",
    "fused_pool_bottleneck_stack",
    "fused_basic_stack",
    "pack_bottleneck_params",
    "pack_basic_params",
]


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


def pack_basic_params(block_tree: Mapping[str, Any]) -> dict:
    """Folded BASIC block param tree -> flat kernel arrays.

    block_tree is one ``layerI_J`` subtree of ``fold_batchnorm`` output for
    a basic-block arch (resnet18/34): two 3x3 convs + FoldedBias biases.
    Stride-1, projection-free blocks only (every non-entry basic block, and
    all of stage 1 — resnet18/34 layer1 has no downsample).
    """
    if "downsample_conv" in block_tree:
        raise ValueError(
            "fused basic stack: projection (stage-entry) blocks stay XLA"
        )
    w1 = block_tree["conv1"]["kernel"]  # [3, 3, Cin, C]
    w2 = block_tree["conv2"]["kernel"]  # [3, 3, C, C]
    if w1.shape[2] != w1.shape[3]:
        raise ValueError(
            "fused basic stack requires Cin == Cout (stride-1 tail blocks)"
        )
    return {
        "w1": w1.reshape(9, w1.shape[2], w1.shape[3]),  # tap-major ky*3+kx
        "b1": block_tree["bn1"]["bias"][None, :],
        "w2": w2.reshape(9, w2.shape[2], w2.shape[3]),
        "b2": block_tree["bn2"]["bias"][None, :],
    }


def _run_basic_chain(xs, refs, out_ref, pad_ref, *, n_blocks, h, w, dtype,
                     group):
    """Op-interleaved BASIC block chain: [relu(3x3) -> 3x3 + residual,
    relu] per block, all maps VMEM-resident.

    refs layout (consumed from index 1): per block w1,b1,w2,b2. Same
    shifted-matmul 3x3 formulation as the bottleneck chain (see module
    doc); the pad scratch is written twice per block — with the block
    input for conv1's taps, then with conv1's output for conv2's — which
    is safe because all nine conv1 taps are consumed before y1 lands.
    """
    p = h * w
    s = w + 1

    pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
    mask_l = (col != 0).astype(dtype)
    mask_r = (col != w - 1).astype(dtype)

    def matmul(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def conv3x3(srcs, wtap):
        """9 shifted matmuls over the pad scratch holding `srcs`."""
        for g in range(group):
            pad_ref[g, s : s + p] = srcs[g]
        accs = [jnp.zeros((p, wtap.shape[-1]), jnp.float32)] * group
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                for g in range(group):
                    tap = pad_ref[g, off : off + p]
                    if kx == 0:
                        tap = tap * mask_l
                    elif kx == 2:
                        tap = tap * mask_r
                    accs[g] = accs[g] + matmul(tap, wtap[ky * 3 + kx])
        return accs

    ri = 1
    for _ in range(n_blocks):
        w1, b1, w2, b2 = (r[...] for r in refs[ri : ri + 4])
        ri += 4
        a1 = conv3x3(xs, w1)
        y1s = [
            jnp.maximum(a1[g] + b1, 0.0).astype(dtype) for g in range(group)
        ]
        a2 = conv3x3(y1s, w2)
        for g in range(group):
            xs[g] = jnp.maximum(
                a2[g] + b2 + xs[g].astype(jnp.float32), 0.0
            ).astype(dtype)

    for g in range(group):
        out_ref[g] = xs[g]


def _basic_stack_kernel(*refs, n_blocks, h, w, dtype, group):
    xs = [refs[0][g] for g in range(group)]
    _run_basic_chain(
        xs, refs, refs[-2], refs[-1], n_blocks=n_blocks, h=h, w=w,
        dtype=dtype, group=group,
    )


def _run_chain(xs, refs, out_ref, pad_ref, *, n_blocks, has_proj, h, w,
               dtype, group):
    """The op-interleaved block chain over a list of [P, Cin] images.

    refs layout (consumed from index 1): per block w1,b1,w2,b2,w3,b3
    [,wd,bd]. All per-image chains are data-independent; interleaving
    them op-by-op exposes VPU/MXU overlap to the scheduler without
    changing any per-image arithmetic.
    """
    p = h * w
    s = w + 1  # write offset inside the padded flat buffer (see module doc)

    # Zero the pad buffers; block centers are fully overwritten below, the
    # border rows/cells stay zero for every block. (Zeroing only on grid
    # step 0 under @pl.when is legal — scratch persists — but measured
    # no better: 1434 vs 1452 clips/s, within-noise-or-worse; the
    # unconditional store is ~0.4 us/step of VPU work.)
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

    ri = 1
    for bi in range(n_blocks):
        proj = has_proj[bi]
        w1, b1, w2, b2, w3, b3 = (r[...] for r in refs[ri : ri + 6])
        ri += 6
        if proj:
            wd, bd = refs[ri][...], refs[ri + 1][...]
            ri += 2

        # conv1 1x1 + bias + relu -> padded scratch centers.
        y1s = [
            jnp.maximum(matmul(xs[g], w1) + b1, 0.0).astype(dtype)
            for g in range(group)
        ]
        for g in range(group):
            pad_ref[g, s : s + p] = y1s[g]

        # conv2 3x3 as 9 shifted matmuls (dy = ky-1, dx = kx-1), each tap
        # issued for every image before the next tap (independent chains).
        accs = [jnp.zeros((p, w2.shape[-1]), jnp.float32)] * group
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                for g in range(group):
                    tap = pad_ref[g, off : off + p]
                    if kx == 0:
                        tap = tap * mask_l
                    elif kx == 2:
                        tap = tap * mask_r
                    accs[g] = accs[g] + matmul(tap, w2[ky * 3 + kx])
        y2s = [
            jnp.maximum(accs[g] + b2, 0.0).astype(dtype) for g in range(group)
        ]

        # conv3 1x1 + residual (projected on the stage-entry block) + relu.
        for g in range(group):
            y3 = matmul(y2s[g], w3) + b3
            res = (
                (matmul(xs[g], wd) + bd) if proj
                else xs[g].astype(jnp.float32)
            )
            xs[g] = jnp.maximum(y3 + res, 0.0).astype(dtype)

    for g in range(group):
        out_ref[g] = xs[g]


def _stack_kernel(*refs, n_blocks, has_proj, h, w, dtype, group):
    """One image group through the whole block stack (flat [P, Cin] in)."""
    xs = [refs[0][g] for g in range(group)]
    _run_chain(
        xs, refs, refs[-2], refs[-1], n_blocks=n_blocks, has_proj=has_proj,
        h=h, w=w, dtype=dtype, group=group,
    )


def _pool_stack_kernel(*refs, n_blocks, has_proj, h, w, c, dtype, group):
    """Stem maxpool + block stack in one kernel body.

    refs[0] is the PRE-pool stem activation in the lane-folded view
    [G, 2H, W, 2C] (x-pairs side by side on the lane axis — see
    ops/pallas_pool.py for why this turns both stride-2 axes into free
    accesses). Pooling in-kernel saves the pooled map's HBM round trip
    (write + re-read, 2*P*C bytes/img) vs pool-then-stack.
    """
    from eov_tpu.ops.pallas_pool import pool_lane_folded

    xs = []
    for g in range(group):
        pooled = pool_lane_folded(refs[0][g], c)  # [2H, W, 2C] -> [H, W, C]
        # Merge (H, W) -> P rows. W is a whole number of sublane tiles
        # (56 = 7*8), so the merge stacks tiles in their memory order.
        xs.append(pooled.reshape(h * w, c))
    _run_chain(
        xs, refs, refs[-2], refs[-1], n_blocks=n_blocks, has_proj=has_proj,
        h=h, w=w, dtype=dtype, group=group,
    )


def _flat_params_and_specs(blocks, dtype, kind="bottleneck"):
    """Flatten block params and build their resident VMEM BlockSpecs.

    ``kind`` is declared by the caller ('bottleneck' or 'basic'), never
    inferred from which keys happen to be present: a bottleneck block
    missing BOTH w3 and b3 would otherwise be silently reclassified as a
    basic block, shortening the flat param list by two entries.
    """
    flat_params, in_specs = [], []
    for b in blocks:
        # Canonical key order shared by both chain kernels' ref consumption:
        # bottleneck w1,b1,w2,b2,w3,b3[,wd,bd]; basic w1,b1,w2,b2. A block
        # missing a required key must fail HERE — the kernels consume refs
        # positionally, so a silently shortened param list would walk the
        # ref stream into the out/scratch refs and return garbage.
        names = ("w1", "b1", "w2", "b2")
        if kind == "bottleneck":
            names += ("w3", "b3")
            if "wd" in b or "bd" in b:
                names += ("wd", "bd")
        else:
            # _run_basic_chain consumes exactly 4 refs per block: stray
            # bottleneck/projection keys would desync the positional walk.
            stray = [k for k in ("w3", "b3", "wd", "bd") if k in b]
            if stray:
                raise KeyError(
                    f"basic-block stack got non-basic params {stray} "
                    "(basic chain consumes w1,b1,w2,b2 only)"
                )
        missing = [k for k in names if k not in b]
        if missing:
            raise KeyError(f"block is missing kernel params {missing}")
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
    return flat_params, in_specs


def _resolve_group(group: int, n: int) -> int:
    """Clamp the op-interleave group to a divisor of the image count.

    Trace-time (not per-step) warning: a benchmark labeled g=N that
    silently ran ungrouped would misattribute its measurement. Callers
    going through models/folded_infer.py arrive pre-clamped (it applies
    row-normalized per-stage scaling first); this guards direct kernel use.
    """
    if group > 0 and n % group == 0:
        return group
    if group > 1:
        import warnings

        warnings.warn(
            f"fused_group={group} does not divide the image count {n}; "
            "running ungrouped (group=1)", stacklevel=3,
        )
    return 1


def _stack_flops_per_img(blocks, p, cmid, cout):
    flops = 0
    for b in blocks:
        flops += 2 * p * b["w1"].shape[0] * b["w1"].shape[1]
        flops += 2 * p * 9 * cmid * cmid
        flops += 2 * p * cmid * cout
        if "wd" in b:
            flops += 2 * p * b["wd"].shape[0] * cout
    return flops


@functools.partial(
    jax.jit, static_argnames=("h", "w", "group", "interpret")
)
def fused_bottleneck_stack(
    x: jax.Array,                      # [N, H*W, Cin] compute-dtype
    blocks: Sequence[Mapping[str, jax.Array]],  # pack_bottleneck_params
    *,
    h: int,
    w: int,
    group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Run a stride-1 bottleneck stack fully VMEM-resident per image group.

    Returns [N, H*W, Cout]. Block 0 may carry a projection shortcut
    (wd/bd); all spatial strides must be 1 (true for every non-entry
    ResNet block, and for all of stage 1). ``group`` images are processed
    per grid step with their (identical, independent) op chains
    interleaved; when N isn't divisible the group degrades to 1.
    """
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

    flat_params, in_specs = _flat_params_and_specs(blocks, dtype)
    in_specs.insert(0, pl.BlockSpec((g, p, cin), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _stack_kernel, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, dtype=dtype, group=g,
    )
    flops_per_img = _stack_flops_per_img(blocks, p, cmid, cout)
    bytes_io = x.dtype.itemsize * n * p * (cin + cout)

    return pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, cout), dtype),
        # + 8 rows of slack: the (+1, +1) tap's slice ends at p + 2w + 2.
        scratch_shapes=[pltpu.VMEM((g, (h + 2) * w + 8, cmid), dtype)],
        # Grouped mode co-lives g images' f32 intermediates plus the
        # double-buffered in/out blocks — past Mosaic's 16 MB default
        # scoped-VMEM limit at stage-1 shapes (measured 27.4 MB at g=2).
        # v5e VMEM is 128 MiB; raise the cap only when grouping.
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


@functools.partial(
    jax.jit, static_argnames=("h", "w", "group", "interpret")
)
def fused_basic_stack(
    x: jax.Array,                      # [N, H*W, C] compute-dtype
    blocks: Sequence[Mapping[str, jax.Array]],  # pack_basic_params
    *,
    h: int,
    w: int,
    group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Run a stride-1 BASIC block stack (resnet18/34) VMEM-resident.

    Same design as ``fused_bottleneck_stack`` — each image's maps enter and
    leave HBM once, the two 3x3 convs per block are 9 shifted matmuls over
    one padded scratch (written twice per block), ``group`` independent
    images interleave op-by-op. Channel count must be constant through the
    stack (true for every basic stage's stride-1 tail, and for all of
    stage 1 which has no entry projection). Returns [N, H*W, C].
    """
    n, p, c = x.shape
    if p != h * w:
        raise ValueError(f"x rows {p} != h*w {h * w}")
    for b in blocks:
        if b["w1"].shape[1] != c or b["w2"].shape[2] != c:
            raise ValueError("fused basic stack: constant channel count "
                             f"required, got {c} vs {b['w1'].shape}")
    g = _resolve_group(group, n)
    dtype = x.dtype

    flat_params, in_specs = _flat_params_and_specs(blocks, dtype,
                                                   kind="basic")
    in_specs.insert(0, pl.BlockSpec((g, p, c), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM))
    kernel = functools.partial(
        _basic_stack_kernel, n_blocks=len(blocks), h=h, w=w,
        dtype=dtype, group=g,
    )
    flops_per_img = len(blocks) * 2 * (2 * p * 9 * c * c)
    bytes_io = x.dtype.itemsize * n * p * 2 * c

    return pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, c), dtype),
        scratch_shapes=[pltpu.VMEM((g, (h + 2) * w + 8, c), dtype)],
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


@functools.partial(
    jax.jit, static_argnames=("group", "interpret")
)
def fused_pool_bottleneck_stack(
    x: jax.Array,                      # [N, 2H, 2W, C] pre-pool NHWC
    blocks: Sequence[Mapping[str, jax.Array]],  # pack_bottleneck_params
    *,
    group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Stem 3x3/s2 maxpool + stride-1 bottleneck stack in ONE kernel.

    ``x`` is the post-ReLU (non-negative) stem activation BEFORE the pool;
    the pool runs in VMEM at the stack entry (ops/pallas_pool.py's
    lane-folded formulation), so the pooled [H, W, C] map never touches
    HBM — vs pool-then-stack this saves its write + re-read (2*H*W*C
    bytes/img) and one kernel dispatch. Returns [N, H*W, Cout].
    """
    n, h2, w2, cin = x.shape
    if h2 % 2 or w2 % 2:
        raise ValueError(f"even H/W required, got {h2}x{w2}")
    h, w = h2 // 2, w2 // 2
    p = h * w
    g = _resolve_group(group, n)
    dtype = x.dtype
    cmid = blocks[0]["w2"].shape[-1]
    cout = blocks[-1]["w3"].shape[-1]
    has_proj = tuple("wd" in b for b in blocks)
    if not has_proj[0] and cin != cout:
        raise ValueError("first block needs a projection when Cin != Cout")

    xv = x.reshape(n, h2, w, 2 * cin)  # lane-folded x-pairs (row-major free)
    flat_params, in_specs = _flat_params_and_specs(blocks, dtype)
    in_specs.insert(
        0, pl.BlockSpec((g, h2, w, 2 * cin), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _pool_stack_kernel, n_blocks=len(blocks), has_proj=has_proj,
        h=h, w=w, c=cin, dtype=dtype, group=g,
    )
    flops_per_img = _stack_flops_per_img(blocks, p, cmid, cout) + p * cin * 8
    bytes_io = x.dtype.itemsize * n * p * (4 * cin + cout)

    return pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, cout), dtype),
        scratch_shapes=[pltpu.VMEM((g, (h + 2) * w + 8, cmid), dtype)],
        # The pre-pool input block is 4x the pooled one (see
        # fused_bottleneck_stack's budget note) — keep the raised cap for
        # every group size here.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * flops_per_img,
            bytes_accessed=bytes_io,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xv, *flat_params)
