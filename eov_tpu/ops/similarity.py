"""Batched one-shot similarity matcher — the eval hot path, XLA reference.

Capability parity: reference components C8 + the fusion side of C9
(SURVEY.md §2a): L2-normalize features, cosine (or negative squared
Euclidean) similarity between query and support clips, per-class fusion over
support members (1-shot real + optional embodied virtual supports), argmax
prediction.

TPU-first design (BASELINE.json:10): the reference loops episodes on the
host with tiny CPU matmuls; here a whole *batch* of E episodes is one fused
device computation —

    query   [E, Q, D]       (Q = n_way * n_query clip features)
    support [E, N, M, D]    (class-major: N classes x M members each;
                             M = k_shot + max virtual supports)
    mask    [E, N, M]       (1 = valid member; ragged virtual banks)

normalize -> one batched matmul on the MXU -> per-class fusion
('max' over members, or 'mean' prototype which is itself a matmul) ->
argmax. A Pallas-fused variant lives in ops/pallas_similarity.py; this XLA
implementation is its semantics reference and the CPU fallback.

Fusion rule for embodied eval is OPEN-1 (SURVEY.md §2a C9): both candidate
rules are implemented and flag-selectable; 'max' (union support,
max-similarity per class) is the default.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

__all__ = [
    "l2_normalize",
    "pairwise_scores",
    "fused_class_scores",
    "predict",
]

Metric = Literal["cosine", "euclidean"]
Fusion = Literal["max", "mean"]

_NEG = -1e30


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """x / max(||x||, eps) along axis (F.normalize semantics)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def pairwise_scores(
    query: jax.Array, support: jax.Array, metric: Metric = "cosine"
) -> jax.Array:
    """Scores [..., Q, S] between query [..., Q, D] and support [..., S, D].

    cosine: normalized dot product. euclidean: negative squared distance
    (higher = closer), computed via the matmul expansion so the MXU does the
    heavy term: -||q||^2 - ||s||^2 + 2 q.s.
    """
    # HIGHEST precision: these matmuls are tiny next to the backbone, and
    # bf16-truncated similarity can flip argmax on near-ties; the reference
    # computes them in f32.
    if metric == "cosine":
        qn = l2_normalize(query)
        sn = l2_normalize(support)
        return jnp.einsum(
            "...qd,...sd->...qs", qn, sn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if metric == "euclidean":
        dots = jnp.einsum(
            "...qd,...sd->...qs", query, support,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        q2 = jnp.sum(jnp.square(query), axis=-1)[..., :, None]
        s2 = jnp.sum(jnp.square(support), axis=-1)[..., None, :]
        return 2.0 * dots - q2 - s2
    raise ValueError(f"unknown metric: {metric}")


def fused_class_scores(
    query: jax.Array,
    support: jax.Array,
    mask: jax.Array | None = None,
    *,
    metric: Metric = "cosine",
    fusion: Fusion = "max",
) -> jax.Array:
    """Per-class scores [..., Q, N] from class-major support [..., N, M, D].

    fusion='max'  — union support set, class score = best member similarity
                    (default embodied rule, OPEN-1).
    fusion='mean' — prototype: class score = similarity to the (masked) mean
                    member, i.e. ProtoNet-style. Prototype is computed before
                    normalization for cosine.
    mask [..., N, M]: 1.0 for valid members. None = all valid.
    """
    n, m = support.shape[-3], support.shape[-2]
    if fusion == "mean":
        if mask is None:
            proto = jnp.mean(support, axis=-2)
        else:
            w = mask[..., None]
            proto = jnp.sum(support * w, axis=-2) / jnp.maximum(
                jnp.sum(w, axis=-2), 1.0
            )
        return pairwise_scores(query, proto, metric)
    if fusion == "max":
        flat = support.reshape(support.shape[:-3] + (n * m, support.shape[-1]))
        s = pairwise_scores(query, flat, metric)
        s = s.reshape(s.shape[:-1] + (n, m))
        if mask is not None:
            s = jnp.where(mask[..., None, :, :] > 0, s, _NEG)
        return jnp.max(s, axis=-1)
    raise ValueError(f"unknown fusion: {fusion}")


def predict(
    query: jax.Array,
    support: jax.Array,
    mask: jax.Array | None = None,
    *,
    metric: Metric = "cosine",
    fusion: Fusion = "max",
) -> jax.Array:
    """Predicted class ids [..., Q] for query clips against class-major support."""
    return jnp.argmax(
        fused_class_scores(query, support, mask, metric=metric, fusion=fusion),
        axis=-1,
    )
