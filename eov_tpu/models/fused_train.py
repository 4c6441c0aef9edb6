"""Stem/tail flax modules for the fused-stage-1 TRAIN path.

Capability parity: reference component C12 (SURVEY.md §3.5) — same
computation as ``models.resnet.ResNet`` with ``partial_bn=True``, but with
stage 1 (layer1_*) excised so train.py can run it through the
custom-differentiated VMEM-fused Pallas stack
(ops/pallas_bottleneck_train.py, motivated by the DESIGN.md §9b trace:
stage-1/2 backward convs dominate the train step at 2-8% MXU).

Param-tree compatibility is the load-bearing property: both modules
declare their submodules with EXACTLY the monolith's names ("conv1",
"bn1", "layer2_0", ..., "fc"), so the ordinary ``TrainState`` variable
tree serves all three applies (stem -> fused stage 1 -> tail) unchanged —
checkpoints, the optimizer masks (train._frozen_bn_mask walks the same
paths), and the weight porter all keep working. Flax ignores the unused
subtrees in each apply.

Only the ``partial_bn=True`` regime is supported: stage BNs must be
frozen (constant affines) for the fused stack's custom VJP to be exact.
train.make_train_step enforces this when resolving ``fused_stage1``.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from eov_tpu.models.resnet import Bottleneck

__all__ = ["ResNetStem", "ResNetSlice", "stage_block_specs"]


def _conv_norm(dtype, precision, *, frozen_bn: bool, train: bool):
    conv = functools.partial(
        nn.Conv, use_bias=False, dtype=dtype, param_dtype=jnp.float32,
        precision=precision,
    )
    norm = functools.partial(
        nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
        param_dtype=jnp.float32,
        use_running_average=frozen_bn or not train,
    )
    return conv, norm


class _S2DConv1(nn.Module):
    """The stem 7x7/s2 conv computed via the space-to-depth rewrite, with
    the ORIGINAL [7,7,3,width] parameter (train-time twin of
    models.resnet.space_to_depth_stem, VERDICT r3 #1a).

    The kernel is zero-padded to 8x8 top/left and refolded to
    [4,4,12,width] INSIDE the forward, and the input's 2x2 phases fold
    into channels — an exact algebraic identity, so autodiff through the
    pad/reshape yields exactly the original conv's parameter gradients
    (the padded taps' cotangents land on the pad and are discarded): no
    optimizer masking, same checkpoint layout, same init. What changes is
    only the conv's SHAPE presented to XLA: dgrad/wgrad contract over 12
    input channels instead of 3 — the training backward's worst MXU shape
    (DESIGN.md §9b: stem dgrad at 2-8% MXU) widened 4x.
    """

    width: int = 64
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        import jax

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, 3, self.width), jnp.float32,
        )
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        # [8,8,3,o] -> [4,dy,4,dx,3,o] -> [4,4,(dy,dx,3),o]  (matches
        # models.resnet.space_to_depth_stem bit for bit)
        k = k.reshape(4, 2, 4, 2, 3, self.width)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.width)
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k.astype(self.dtype), (1, 1),
            [(2, 1), (2, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )


class ResNetStem(nn.Module):
    """conv1 -> bn1 (the ONE trainable BN under partial_bn) -> relu -> maxpool."""

    width: int = 64
    dtype: Any = jnp.float32
    precision: Any = None
    s2d: bool = False   # stem conv via the space-to-depth rewrite (same
                        # params — see _S2DConv1); requires even H and W
    pool_vjp: bool = False  # stem maxpool through the custom-VJP op whose
                            # backward avoids select_and_scatter
                            # (ops/pool.maxpool_3x3_s2_vjp)

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        conv, norm = _conv_norm(
            self.dtype, self.precision, frozen_bn=False, train=train
        )
        x = x.astype(self.dtype)
        if self.s2d:
            x = _S2DConv1(
                width=self.width, dtype=self.dtype,
                precision=self.precision, name="conv1",
            )(x)
        else:
            x = conv(self.width, (7, 7), strides=(2, 2),
                     padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        if self.pool_vjp:
            from eov_tpu.ops.pool import maxpool_3x3_s2_vjp

            return maxpool_3x3_s2_vjp(x)
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )


class ResNetSlice(nn.Module):
    """An arbitrary run of frozen-BN bottleneck blocks (+ optional head).

    ``blocks`` is a sequence of (name, filters, strides) — names must
    match the monolith's (``layerI_J``) so the shared variable tree
    resolves. Used by train.py to wrap the XLA-run pieces between fused
    Pallas stacks (e.g. the strided stage-entry blocks, and stages 3-4
    plus the classifier head).
    """

    blocks: Sequence[tuple]  # (name, filters, strides)
    head: bool = False       # append pool -> dropout -> fc
    num_classes: int | None = None
    dtype: Any = jnp.float32
    dropout_rate: float = 0.0
    remat: bool = False
    precision: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        conv, norm = _conv_norm(
            self.dtype, self.precision, frozen_bn=True, train=train
        )
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for name, filters, strides in self.blocks:
            x = block_cls(
                filters=filters, strides=strides, conv=conv, norm=norm,
                name=name,
            )(x)
        if self.head:
            x = jnp.mean(x, axis=(-3, -2)).astype(jnp.float32)
            if self.num_classes is not None:
                if self.dropout_rate > 0:
                    x = nn.Dropout(
                        self.dropout_rate, deterministic=not train
                    )(x)
                x = nn.Dense(
                    self.num_classes, dtype=jnp.float32, name="fc"
                )(x)
        return x


def stage_block_specs(
    stage_sizes: Sequence[int], width: int, stages: Sequence[int]
) -> list[tuple]:
    """(name, filters, strides) specs for the given 1-based stages."""
    out = []
    for i, n_blocks in enumerate(stage_sizes):
        if (i + 1) not in stages:
            continue
        for j in range(n_blocks):
            out.append((
                f"layer{i + 1}_{j}",
                width * 2**i,
                2 if (i > 0 and j == 0) else 1,
            ))
    return out
