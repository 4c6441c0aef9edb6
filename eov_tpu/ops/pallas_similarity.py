"""Pallas TPU kernel: fused batched episode matcher.

The north-star op (BASELINE.json:4 "one-shot classifier ... becomes a single
batched matmul kernel over support/query episodes"): for each episode in a
batch, L2-normalize query and support clip features, run the similarity
matmuls on the MXU, apply the validity mask, fuse per-class over support
members, all in one VMEM-resident kernel — the per-member similarity matrix
never round-trips to HBM and the normalize/mask/fuse epilogues ride the same
pass.

Semantics reference: ops/similarity.py (XLA path) — parity-tested in
tests/test_pallas_similarity.py via interpret mode on CPU and compiled on
TPU.

Per grid step (= one episode), class-major support:
    query   [1, Qp, D]     Qp = n_way*n_query padded to 8
    support [1, N, Mp, D]  Mp = members padded to 8
    bias    [1, N, Mp]     0 valid member, -1e30 padding/invalid
    out     [1, Qp, Np]    Np = 128 (class scores in first N lanes)

The class loop is a static Python unroll (N is 5-20); each way's similarity
is one [Qp, D] x [D, Mp] MXU matmul followed by a lane-reduce max. D must be
a 128 multiple (2048 for ResNet-50).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["episode_class_scores", "episode_predict"]

_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matcher_kernel(q_ref, s_ref, b_ref, o_ref, *, n_way, metric):
    q = q_ref[0]  # [Qp, D]

    if metric == "cosine":
        q = q * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(q * q, axis=1, keepdims=True), 1e-24)
        )
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [Qp, 1] (euclidean term)

    cols = []
    for n in range(n_way):  # static unroll, N is small
        s = s_ref[0, n]  # [Mp, D]
        if metric == "cosine":
            s = s * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(s * s, axis=1, keepdims=True), 1e-24)
            )
        dots = jax.lax.dot_general(
            q, s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # Full f32 (3-pass bf16) MXU precision: the matcher is a
            # negligible FLOP share next to the backbone, and near-tie
            # argmaxes flip under single-pass bf16 input rounding.
            precision=jax.lax.Precision.HIGHEST,
        )  # [Qp, Mp]
        if metric == "cosine":
            sims = dots
        else:
            s2 = jnp.sum(s * s, axis=1)[None, :]  # [1, Mp]
            sims = 2.0 * dots - q2 - s2
        sims = sims + b_ref[0, n][None, :]  # mask/pad bias
        cols.append(jnp.max(sims, axis=1, keepdims=True))  # [Qp, 1]

    fused = jnp.concatenate(cols, axis=1)  # [Qp, N]
    o_ref[0] = jnp.pad(
        fused, ((0, 0), (0, o_ref.shape[2] - n_way)), constant_values=_NEG
    )


@functools.partial(jax.jit, static_argnames=("metric", "fusion", "interpret"))
def episode_class_scores(
    query: jax.Array,    # [E, Q, D]
    support: jax.Array,  # [E, N, M, D] class-major
    mask: jax.Array,     # [E, N, M] 1=valid
    *,
    metric: str = "cosine",
    fusion: str = "max",
    interpret: bool = False,
) -> jax.Array:
    """Fused per-class scores [E, Q, N] — Pallas TPU fast path.

    Matches ops/similarity.fused_class_scores on valid entries (modulo MXU
    bf16-input rounding; tests bound it at 2e-3 on cosine scores).
    """
    e, q, d = query.shape
    _, n, m, _ = support.shape
    if d % 128 != 0:
        raise ValueError(f"feature dim {d} must be a multiple of 128")

    if fusion == "mean":
        # Prototype fusion = masked mean per class on the caller side (one
        # XLA reduce), then the same kernel with M=1.
        w = mask[..., None]
        support = jnp.sum(support * w, axis=2, keepdims=True) / jnp.maximum(
            jnp.sum(w, axis=2, keepdims=True), 1.0
        )
        mask = (jnp.sum(mask, axis=2, keepdims=True) > 0).astype(mask.dtype)
        m = 1
    elif fusion != "max":
        raise ValueError(f"unknown fusion: {fusion}")

    qp = _round_up(max(q, 8), 8)
    mp = _round_up(max(m, 8), 8)

    query_p = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, qp - q), (0, 0)))
    sup_p = jnp.pad(
        support.astype(jnp.float32), ((0, 0), (0, 0), (0, mp - m), (0, 0))
    )
    mask_p = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, 0), (0, mp - m)))
    bias = jnp.where(mask_p > 0, 0.0, _NEG)  # [E, N, Mp]

    np_out = 128
    kernel = functools.partial(_matcher_kernel, n_way=n, metric=metric)
    out = pl.pallas_call(
        kernel,
        grid=(e,),
        in_specs=[
            pl.BlockSpec((1, qp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, mp, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, mp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, np_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, qp, np_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * qp * n * mp * d,
            bytes_accessed=4 * e * (qp * d + n * mp * d + qp * np_out),
            transcendentals=0,
        ),
        interpret=interpret,
    )(query_p, sup_p, bias)
    return out[:, :q, :n]


def episode_predict(
    query, support, mask, *, metric="cosine", fusion="max", interpret=False
):
    """Argmax class ids [E, Q] via the fused kernel."""
    return jnp.argmax(
        episode_class_scores(
            query, support, mask, metric=metric, fusion=fusion,
            interpret=interpret,
        ),
        axis=-1,
    )
