"""Vectorized episodic N-way K-shot sampler — seeded, device-resident.

Capability parity: reference component C7 (SURVEY.md §2a): sample N classes
from the meta-test split, K support + Q query clips per class, support and
query disjoint.

TPU-first design: the reference draws episodes one at a time with
``random.sample`` on the host (SURVEY.md §3.2); here all E episodes of a
batch are sampled in one jitted computation via the exchangeability trick —
ranked per-item uniforms are a uniform draw without replacement — so episode
construction fuses with the gather + matmul eval step (BASELINE.json:10,
64 episodes/step).

Canonical seeding (SURVEY.md §3.2 seeded protocol, §4.5): episode g's
randomness is ``fold_in(key, g)`` where g is the GLOBAL episode ordinal —
a pure function of (seed, protocol config), invariant to episodes_per_step,
mesh size, and single- vs multi-chip execution. Batch samplers take a
``base_ordinal`` and cover ordinals [base, base + n_episodes).

Feature stores are padded to rectangular [C, max_clips]; per-class counts
mask invalid slots out of the draw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EpisodeIndices", "sample_episodes", "query_labels"]


class EpisodeIndices(NamedTuple):
    """Indices defining a batch of episodes.

    class_ids:   [E, N]    — dataset class index of each way
    support_idx: [E, N, K] — clip slot (within class) of each support member
    query_idx:   [E, N, Q] — query clip slots (disjoint from support by
                             construction: both come from one ranked draw)
    """

    class_ids: jax.Array
    support_idx: jax.Array
    query_idx: jax.Array


def sample_episodes(
    key: jax.Array,
    class_counts: jax.Array,
    *,
    n_way: int,
    k_shot: int,
    n_query: int,
    n_episodes: int,
    max_clips: int,
    base_ordinal: jax.Array | int = 0,
) -> EpisodeIndices:
    """Sample episodes with global ordinals [base, base + n_episodes).

    Args:
        key: PRNG key — identical keys give identical episodes (the eval
            protocol's determinism requirement, SURVEY.md §4.3).
        class_counts: int32 [C], clips available per class.
        max_clips: static padded per-class capacity (>= class_counts.max()).
        base_ordinal: global ordinal of the first episode in this batch
            (traced scalar is fine). Episode g uses ``fold_in(key, g)`` so
            the full episode sequence is independent of how it is batched
            across steps or sharded across devices.

    Classes with fewer than k_shot + n_query clips are never selected.
    """
    c = class_counts.shape[0]
    need = k_shot + n_query
    if n_way > c:
        raise ValueError(f"n_way={n_way} > {c} classes")
    if need > max_clips:
        raise ValueError(f"k_shot+n_query={need} > max_clips={max_clips}")

    ordinals = jnp.asarray(base_ordinal, jnp.int32) + jnp.arange(
        n_episodes, dtype=jnp.int32
    )
    ep_keys = jax.vmap(lambda g: jax.random.fold_in(key, g))(ordinals)
    k_cls, k_clip = jax.vmap(jax.random.split, out_axes=1)(ep_keys)

    # --- N classes per episode: ranked uniforms over eligible classes ---
    eligible = class_counts >= need  # [C]
    cls_scores = jax.vmap(lambda k: jax.random.uniform(k, (c,)))(k_cls)
    cls_scores = jnp.where(eligible[None, :], cls_scores, -1.0)
    _, class_ids = jax.lax.top_k(cls_scores, n_way)  # [E, N]

    # --- k+q clip slots within each chosen class: ranked masked uniforms ---
    counts_sel = class_counts[class_ids]  # [E, N]
    slot_scores = jax.vmap(
        lambda k: jax.random.uniform(k, (n_way, max_clips))
    )(k_clip)
    valid = (
        jnp.arange(max_clips, dtype=jnp.int32)[None, None, :]
        < counts_sel[..., None]
    )
    slot_scores = jnp.where(valid, slot_scores, -1.0)
    _, slots = jax.lax.top_k(slot_scores, need)  # [E, N, need]

    return EpisodeIndices(
        class_ids=class_ids.astype(jnp.int32),
        support_idx=slots[..., :k_shot].astype(jnp.int32),
        query_idx=slots[..., k_shot:].astype(jnp.int32),
    )


def query_labels(n_way: int, n_query: int) -> jax.Array:
    """Ground-truth labels [N*Q] for queries laid out class-major."""
    return jnp.repeat(jnp.arange(n_way, dtype=jnp.int32), n_query)
