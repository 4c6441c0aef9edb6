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

__all__ = ["maxpool_3x3_s2_nonneg", "maxpool_3x3_s2_separable",
           "maxpool_3x3_s2_vjp"]


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


@jax.custom_vjp
def maxpool_3x3_s2_vjp(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2/p1 max-pool whose BACKWARD avoids ``select_and_scatter``.

    Train-path twin of the stem pool (SURVEY.md §2a C4 backward; VERDICT
    r3 #1b). Forward is the production ``reduce_window`` unchanged; the
    custom backward routes each window's cotangent to the FIRST maximal
    element in row-major window order — measured to be exactly XLA's
    select_and_scatter tie rule (probe: all-zero and two-way-tie windows,
    tests/test_train_fused.py) — via 9 strided tap gathers, equality
    one-hots with a prefix-seen chain, and 9 interior-padded scatters:
    all fusable elementwise/pad ops instead of the serial
    select_and_scatter lowering (1.4 ms, 3.3% of the train step in the
    DESIGN.md §9b trace). Routing is identical; summed values can differ
    from select_and_scatter in the last ulp where a position accumulates
    cotangents from several windows in a different order.
    """
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def _maxpool_vjp_fwd(x):
    y = maxpool_3x3_s2_vjp(x)
    return y, (x, y)


def _maxpool_vjp_bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    seen = None
    parts = []
    for dy in range(3):
        for dx in range(3):
            # Tap (dy, dx) of every window, at output resolution.
            xt = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + 2 * oh - 1, dx + 2 * ow - 1, c),
                (1, 2, 2, 1),
            )
            eq = xt == y
            first = eq if seen is None else (eq & ~seen)
            seen = eq if seen is None else (seen | eq)
            contrib = jnp.where(first, g, jnp.zeros((), g.dtype))
            # Scatter back to input coordinates: interior-dilate by the
            # stride and offset by the tap; padded frame sliced off below.
            parts.append(jax.lax.pad(
                contrib, jnp.zeros((), g.dtype),
                [(0, 0, 0), (dy, 3 - dy, 1), (dx, 3 - dx, 1), (0, 0, 0)],
            ))
    dxp = parts[0]
    for p in parts[1:]:
        dxp = dxp + p
    return (jax.lax.slice(dxp, (0, 1, 1, 0), (n, h + 1, w + 1, c)),)


maxpool_3x3_s2_vjp.defvjp(_maxpool_vjp_fwd, _maxpool_vjp_bwd)
