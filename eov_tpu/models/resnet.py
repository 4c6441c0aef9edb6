"""ResNet backbone in flax.linen — NHWC, TPU-first.

Capability parity: reference component C4 (SURVEY.md §2a) — the reference
wraps ``torchvision.models.resnet50(pretrained=True)`` with its classifier
head removed and uses the penultimate 2048-d features as the clip descriptor.
This is a ground-up flax implementation of the same architecture family
(ResNet v1.5: stride-2 lives in the 3x3 conv of the downsampling bottleneck,
matching torchvision so ported ImageNet weights are bit-compatible).

TPU design notes:
* NHWC layout throughout — XLA:TPU's native conv layout; channels land on
  the 128-lane axis and convs map onto the MXU without transposes.
* Compute dtype is a parameter (bf16 by default on TPU); parameters and
  BatchNorm statistics/arithmetic stay float32 for accuracy.
* Inference-mode BN folds into a scale/bias affine — XLA fuses it with the
  adjacent conv, so no hand kernel is needed for the backbone (SURVEY.md §2b
  row N2).
* No data-dependent Python control flow; a single jitted apply handles any
  leading batch shape.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResNet", "ResNet18", "ResNet34", "ResNet50", "ResNet101",
           "ResNet152", "feature_apply", "resnet50_feature_apply",
           "fold_batchnorm", "space_to_depth_stem"]

ModuleDef = Any


class FoldedBias(nn.Module):
    """Inference-folded BatchNorm: a per-channel bias add in compute dtype.

    Used with ``ResNet(folded=True)`` on variables produced by
    ``fold_batchnorm`` — the BN scale/statistics have been folded into the
    preceding conv's kernel, so all that remains is ``x + bias``. Keeping it
    in the compute dtype (bf16 on TPU) removes the f32 upcast/downcast
    round-trip that inference-mode BatchNorm pays per layer.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias = self.param(
            "bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32
        )
        return x + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3 (stride here) -> 1x1, + shortcut."""

    filters: int  # bottleneck width; output channels = 4 * filters
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), padding="VALID", name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # Explicit (1,1) padding: torch semantics. XLA's SAME pads (0,1) for
        # stride-2 3x3 on even inputs, which shifts every window one pixel.
        y = self.conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1), padding="VALID", name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape[-1] != self.filters * 4 or self.strides != 1:
            residual = self.conv(
                self.filters * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                padding="VALID",
                name="downsample_conv",
            )(x)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """ResNet basic block (18/34): 3x3 (stride) -> 3x3, + shortcut."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(
            self.filters,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)],
            name="conv1",
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn2")(y)

        if residual.shape[-1] != self.filters or self.strides != 1:
            residual = self.conv(
                self.filters,
                (1, 1),
                strides=(self.strides, self.strides),
                padding="VALID",
                name="downsample_conv",
            )(x)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """NHWC ResNet feature extractor.

    ``__call__`` returns pooled features of width ``4*512`` (bottleneck) or
    ``512`` (basic) — the reference's penultimate layer. An optional
    ``num_classes`` adds the linear head (used only by the finetune path,
    reference component C12).
    """

    stage_sizes: Sequence[int]
    block_cls: type = Bottleneck
    num_classes: int | None = None
    width: int = 64
    dtype: Any = jnp.float32
    use_running_average: bool = True  # inference-mode BN by default
    folded: bool = False  # BN folded into convs (fold_batchnorm variables)
    # TSN finetune details (reference C12 lineage): partial_bn freezes every
    # BN except the first (stem bn1) during training — stats and normalization
    # both use the running averages; dropout_rate applies before the fc head.
    partial_bn: bool = False
    dropout_rate: float = 0.0
    # MXU-friendly stem: 2x2 space-to-depth on the input turns the 7x7/s2
    # conv over 3 channels into an equivalent 4x4/s1 conv over 12 channels
    # (4x the lane utilization, half the spatial extent). Exact rewrite —
    # use with variables from space_to_depth_stem().
    stem_s2d: bool = False
    # Rematerialize each residual block's activations in the backward pass
    # (jax.checkpoint): ~1/3 extra forward FLOPs for O(depth) -> O(1)
    # activation memory per block — lets train batches scale past HBM.
    remat: bool = False
    # None = backend default (bf16-truncated conv inputs on CPU/TPU — the
    # production TPU setting). Parity tests pass Precision.HIGHEST for true
    # f32 accumulation against the torch reference.
    precision: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool | None = None):
        use_ra = self.use_running_average if train is None else not train
        conv = functools.partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=self.precision,
        )
        if self.folded:
            if train:
                raise ValueError("folded BN is inference-only")
            norm = functools.partial(FoldedBias, dtype=self.dtype)
        else:
            bn_count = [0]
            base_norm = functools.partial(
                nn.BatchNorm,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,  # BN math in f32 regardless of compute dtype
                param_dtype=jnp.float32,
            )

            def norm(**kw):
                # partial_bn: only the first BN trains; the rest stay frozen
                # on running stats (TSN rule — module instantiation order is
                # static, stem bn1 is always index 0).
                i = bn_count[0]
                bn_count[0] += 1
                frozen = self.partial_bn and i > 0
                return base_norm(use_running_average=use_ra or frozen, **kw)

        x = x.astype(self.dtype)
        if self.stem_s2d:
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            # Asymmetric (2,1) padding: the derivation pads the 7x7 kernel to
            # 8x8 with a zero top/left row before folding into (a, dy) pairs.
            x = conv(self.width, (4, 4), padding=[(2, 1), (2, 1)],
                     name="conv1")(x)
        else:
            x = conv(self.width, (7, 7), strides=(2, 2),
                     padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1) semantics: pad with -inf.
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        block_cls = nn.remat(self.block_cls) if self.remat else self.block_cls
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(
                    filters=self.width * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"layer{i + 1}_{j}",
                )(x)

        x = jnp.mean(x, axis=(-3, -2))  # global average pool over H, W
        x = x.astype(jnp.float32)
        if self.num_classes is not None:
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


ResNet18 = functools.partial(ResNet, stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
ResNet34 = functools.partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock)
ResNet50 = functools.partial(ResNet, stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck)
ResNet101 = functools.partial(ResNet, stage_sizes=(3, 4, 23, 3), block_cls=Bottleneck)
ResNet152 = functools.partial(ResNet, stage_sizes=(3, 8, 36, 3), block_cls=Bottleneck)


_BN_PARTNER = {
    "conv1": "bn1",
    "conv2": "bn2",
    "conv3": "bn3",
    "downsample_conv": "downsample_bn",
}


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold inference BN into conv kernels -> variables for ResNet(folded=True).

    Standard inference rewrite: with s = gamma / sqrt(var + eps),
        BN(conv(x)) = conv'(x) + b'   where  K' = K * s,  b' = beta - mean * s.
    The returned tree has each BN module replaced by a FoldedBias {bias: b'}
    and no batch_stats collection. Conv arithmetic is unchanged (scaling a
    kernel is exact in f32), so folded == unfolded to float rounding; the
    throughput win is dropping BN's per-layer f32 round-trip (~halves the
    non-conv elementwise work of the inference path).
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold_module(p: dict, s: dict) -> dict:
        out = {}
        for name, sub in p.items():
            if name in _BN_PARTNER and _BN_PARTNER[name] in p:
                bn = p[_BN_PARTNER[name]]
                st = s[_BN_PARTNER[name]]
                scale = bn["scale"] / jnp.sqrt(st["var"] + eps)
                out[name] = {"kernel": sub["kernel"] * scale}
                out[_BN_PARTNER[name]] = {
                    "bias": bn["bias"] - st["mean"] * scale
                }
            elif name.startswith(("bn", "downsample_bn")):
                continue  # handled with its conv partner
            elif isinstance(sub, dict) and name in s:
                out[name] = fold_module(sub, s[name])
            else:
                out[name] = sub  # e.g. the fc head
        return out

    return {"params": fold_module(params, stats)}


def space_to_depth_stem(variables):
    """Rewrite conv1 [7,7,3,64] -> [4,4,12,64] for ResNet(stem_s2d=True).

    Exact algebraic rewrite: pad the 7x7 kernel to 8x8 with a zero top/left
    row/col, then fold each (2x2 phase, channel) pair of taps into one of 12
    input channels: W'[a,b,(dy,dx,c),o] = W8[2a+dy, 2b+dx, c, o]. Composes
    with fold_batchnorm (order-independent: both only touch conv kernels
    linearly). Output matches the 7x7/s2 stem bit-for-bit up to conv
    accumulation order.
    """

    def rewrite(tree):
        out = {}
        for name, sub in tree.items():
            if name == "conv1" and isinstance(sub, dict) and "kernel" in sub \
                    and sub["kernel"].shape[:3] == (7, 7, 3):
                k = jnp.pad(sub["kernel"], ((1, 0), (1, 0), (0, 0), (0, 0)))
                # [8,8,3,o] -> [4,dy,4,dx,3,o] -> [4,4,(dy,dx,3),o]
                k = k.reshape(4, 2, 4, 2, 3, k.shape[-1])
                k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, -1)
                out[name] = dict(sub, kernel=k)
            elif isinstance(sub, dict):
                out[name] = rewrite(sub)
            else:
                out[name] = sub
        return out

    return {k: rewrite(v) if k == "params" else v for k, v in variables.items()}


def feature_apply(
    params, frames: jax.Array, *, arch: str = "resnet50",
    dtype=jnp.bfloat16, folded: bool = False, stem_s2d: bool = False,
) -> jax.Array:
    """Pure apply: frames [..., H, W, 3] float -> features [..., D].

    D = 2048 (bottleneck archs) or 512 (basic-block archs). Leading dims are
    flattened for the conv stack and restored after — one big NHWC batch
    keeps the MXU fed (SURVEY.md §3.1 hot loop). Pass ``folded=True`` with
    ``fold_batchnorm`` variables for the BN-free inference program.
    """
    from eov_tpu.models import get_arch  # registry lives in __init__

    ctor, _, _ = get_arch(arch)
    model = ctor(
        num_classes=None, dtype=dtype, folded=folded, stem_s2d=stem_s2d
    )
    lead = frames.shape[:-3]
    flat = frames.reshape((-1,) + frames.shape[-3:])
    feats = model.apply(params, flat)
    return feats.reshape(lead + (feats.shape[-1],))


def resnet50_feature_apply(
    params, frames: jax.Array, *, dtype=jnp.bfloat16, folded: bool = False,
    stem_s2d: bool = False,
) -> jax.Array:
    """ResNet-50 alias of :func:`feature_apply` (the reference's backbone)."""
    return feature_apply(
        params, frames, arch="resnet50", dtype=dtype, folded=folded,
        stem_s2d=stem_s2d,
    )
