"""Max-pool rewrites for the TPU inference path.

Capability parity: the backbone stem's 3x3/s2 max-pool (SURVEY.md §2a C4 —
torchvision ResNet `maxpool`). Semantics reference is
``lax.reduce_window(max)`` as used by models/resnet.py; this module is an
exact rewrite for the folded inference path.

Why it exists: the r2 on-hardware profile (DESIGN.md §9) measured XLA's
``reduce-window`` lowering at 6.9% of the extraction step — ~2.5x over its
HBM roofline (~2 MB/image at 819 GB/s). A 3x3 stride-2 max-pool is
separable into two 3-tap maxes, and with *non-negative* inputs (the pool
sits after a ReLU) the -inf edge padding can be ordinary zero padding, so
the whole op becomes two chains of strided slices + ``jnp.maximum``.

**Both rewrites measured NEGATIVE on v5e (BASELINE.md r2) — not wired into
production.** Strided-slice variant: stride-2 slices along the tiled H/W
dims do not fuse; XLA emits relayout copies (1438 -> 888 clips/s/chip).
Separable variant: the full-width intermediate map's HBM round-trip costs
more than dropping 3 of 9 window taps saves (1452 -> 1409). Kept as
parity-tested rewrites so the results aren't re-derived; the folded
inference path stays on the single fused ``reduce_window``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["maxpool_3x3_s2_nonneg", "maxpool_3x3_s2_separable"]


def maxpool_3x3_s2_separable(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2/p1 max-pool as two separable reduce_windows (exact).

    max over a 3x3 window == max over rows of (max over columns): the two
    1-D reduce_windows evaluate 6 window taps per output instead of 9 for
    a lowering that is VPU-bound (DESIGN.md §9 r2 measured the fused 3x3
    reduce_window at ~2.5x its HBM roofline). Bit-exact for any input —
    unlike the nonneg strided-slice variant this needs no sign assumption.
    """
    v = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
        [(0, 0), (1, 1), (0, 0), (0, 0)],
    )
    return jax.lax.reduce_window(
        v, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        [(0, 0), (0, 0), (1, 1), (0, 0)],
    )


def maxpool_3x3_s2_nonneg(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-2/pad-1 max-pool over NHWC, valid for inputs >= 0.

    Bit-identical to
    ``lax.reduce_window(x, -inf, max, (1,3,3,1), (1,2,2,1), pad 1)`` when
    ``x >= 0`` elementwise: every pooling window contains at least one
    in-bounds element, and that element is >= the 0 the padding contributes
    (max over an identical candidate set, no arithmetic) — parity-locked in
    tests/test_preprocess.py. The stem pool qualifies (post-ReLU input).
    """
    n, h, w, c = x.shape
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = jnp.maximum(
        jnp.maximum(xp[:, 0 : 2 * oh - 1 : 2], xp[:, 1 : 2 * oh : 2]),
        xp[:, 2 : 2 * oh + 1 : 2],
    )
    return jnp.maximum(
        jnp.maximum(v[:, :, 0 : 2 * ow - 1 : 2], v[:, :, 1 : 2 * ow : 2]),
        v[:, :, 2 : 2 * ow + 1 : 2],
    )
