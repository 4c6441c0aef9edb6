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


class ResNetStem(nn.Module):
    """conv1 -> bn1 (the ONE trainable BN under partial_bn) -> relu -> maxpool."""

    width: int = 64
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        conv, norm = _conv_norm(
            self.dtype, self.precision, frozen_bn=False, train=train
        )
        x = x.astype(self.dtype)
        x = conv(self.width, (7, 7), strides=(2, 2),
                 padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
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
