"""Episodic one-shot evaluation harness — batched, jitted, seeded.

Capability parity: reference components C7+C8+C9+C10 composed
(SURVEY.md §3.2/3.3): N-way K-shot episodes over a cached feature table,
accuracy aggregated as mean ± 95% CI over E episodes (600 by default,
BASELINE.json:8; episode count is OPEN-2 and configurable).

TPU-first: the reference's per-episode host loop becomes a scan of jitted
device steps, each step sampling + gathering + classifying
``episodes_per_step`` episodes at once (64, BASELINE.json:10): sampler
(episodes.py) -> feature gather -> batched normalize/matmul/fuse/argmax
(ops/similarity.py) -> per-episode accuracy, entirely on device. The host
only accumulates the [E] accuracy vector and computes the CI.

Embodied eval (config 3, BASELINE.json:9): a virtual support bank
[C, V, D] (UnrealAction features, embodied.py) is appended to each chosen
class's support members with a validity mask; fusion rule per OPEN-1.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eov_tpu import episodes as ep
from eov_tpu.ops import similarity

__all__ = ["EvalConfig", "EvalResult", "FeatureTable", "evaluate", "eval_step"]


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """One-shot eval protocol (reference defaults, BASELINE.json:8)."""

    n_way: int = 5
    k_shot: int = 1
    n_query: int = 1
    n_episodes: int = 600
    episodes_per_step: int = 64
    metric: str = "cosine"  # 'cosine' | 'euclidean'
    fusion: str = "max"     # 'max' (union support) | 'mean' (prototype)
    seed: int = 0
    embodied: bool = False
    # 'auto': Pallas fused matcher kernel on TPU, XLA path elsewhere.
    matcher: str = "auto"   # 'auto' | 'xla' | 'pallas'


class FeatureTable(NamedTuple):
    """Padded rectangular clip-feature store for a split.

    features: [C, M, D] float32 — clip features, class-major slots
    counts:   [C] int32         — valid clips per class
    """

    features: jax.Array
    counts: jax.Array


class EvalResult(NamedTuple):
    mean_acc: float
    ci95: float
    per_episode: np.ndarray  # [E] accuracies in sample order

    def __str__(self) -> str:  # format-compatible final line (SURVEY.md §5)
        return f"accuracy: {self.mean_acc * 100:.2f}% +/- {self.ci95 * 100:.2f}%"


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_way", "k_shot", "n_query", "n_step", "metric", "fusion", "matcher"
    ),
)
def eval_step(
    key,
    base_ordinal,     # scalar int32: global ordinal of this step's first episode
    features,         # [C, M, D]
    counts,           # [C]
    virtual_feats,    # [C, V, D] or None
    virtual_counts,   # [C] or None
    *,
    n_way: int,
    k_shot: int,
    n_query: int,
    n_step: int,
    metric: str,
    fusion: str,
    matcher: str = "auto",
):
    """One device step: sample + gather + classify episodes with global
    ordinals [base_ordinal, base_ordinal + n_step) — the canonical seeded
    protocol (episodes.py): the episode set depends only on (key, ordinal),
    never on step batching or mesh layout.

    Returns per-episode accuracy [n_step] (float32).
    """
    idx = ep.sample_episodes(
        key,
        counts,
        n_way=n_way,
        k_shot=k_shot,
        n_query=n_query,
        n_episodes=n_step,
        max_clips=features.shape[1],
        base_ordinal=base_ordinal,
    )

    # Gathers: [E, N, K, D] support, [E, N, Q, D] query.
    sup = features[idx.class_ids[..., None], idx.support_idx]
    qry = features[idx.class_ids[..., None], idx.query_idx]
    e = sup.shape[0]
    mask = jnp.ones(sup.shape[:-1], jnp.float32)

    if virtual_feats is not None:
        # Append the virtual members of each chosen class: [E, N, V, D].
        virt = virtual_feats[idx.class_ids]
        vmask = (
            jnp.arange(virtual_feats.shape[1], dtype=jnp.int32)[None, None, :]
            < virtual_counts[idx.class_ids][..., None]
        ).astype(jnp.float32)
        sup = jnp.concatenate([sup, virt], axis=2)
        mask = jnp.concatenate([mask, vmask], axis=2)

    qry_flat = qry.reshape(e, n_way * n_query, -1)
    # 'auto' resolves to the XLA path: measured 10% faster than the Pallas
    # kernel at protocol scale (103k vs 94k episodes/s on v5e — XLA fuses
    # the tiny normalize+matmul+fuse chain fine; BASELINE.md). The kernel
    # stays available ('pallas') and hardware-parity-tested.
    use_pallas = matcher == "pallas" and (
        jax.default_backend() == "tpu"
        and qry_flat.shape[-1] % 128 == 0  # kernel needs lane-aligned D
    )
    if use_pallas:
        from eov_tpu.ops.pallas_similarity import episode_predict

        preds = episode_predict(
            qry_flat, sup, mask, metric=metric, fusion=fusion
        )  # [E, N*Q]
    else:
        preds = similarity.predict(
            qry_flat, sup, mask, metric=metric, fusion=fusion
        )  # [E, N*Q]
    labels = ep.query_labels(n_way, n_query)[None, :]
    return jnp.mean((preds == labels).astype(jnp.float32), axis=-1)


def evaluate(
    table: FeatureTable,
    cfg: EvalConfig,
    virtual: FeatureTable | None = None,
) -> EvalResult:
    """Run the full protocol: E episodes in device-steps, mean ± 95% CI."""
    if cfg.embodied and virtual is None:
        raise ValueError("embodied eval requires a virtual FeatureTable")
    if cfg.embodied and virtual is not None:
        d_real = table.features.shape[-1]
        d_virt = virtual.features.shape[-1]
        if d_real != d_virt:
            raise ValueError(
                f"real ({d_real}-d) and virtual ({d_virt}-d) features were "
                "extracted with different backbones; re-extract one side"
            )
    # Host-side eligibility guard: inside jit the sampler cannot raise, and
    # with < n_way eligible classes it would silently pick invalid slots.
    need = cfg.k_shot + cfg.n_query
    n_eligible = int(np.sum(np.asarray(table.counts) >= need))
    if n_eligible < cfg.n_way:
        raise ValueError(
            f"only {n_eligible} classes have >= {need} clips; "
            f"n_way={cfg.n_way} episodes are not sampleable"
        )
    vf = virtual.features if (cfg.embodied and virtual) else None
    vc = virtual.counts if (cfg.embodied and virtual) else None

    # Resolve the matcher here, loudly: an explicit 'pallas' request that the
    # backend/shape can't honor must not silently return XLA numbers (it
    # would misattribute benchmark measurements).
    matcher = cfg.matcher
    if matcher == "pallas":
        d = int(table.features.shape[-1])
        reasons = []
        if jax.default_backend() != "tpu":
            reasons.append(f"backend is {jax.default_backend()}, not tpu")
        if d % 128 != 0:
            reasons.append(f"feature dim {d} is not lane-aligned (128)")
        if reasons:
            import warnings

            warnings.warn(
                "matcher='pallas' cannot be honored ("
                + "; ".join(reasons)
                + "); falling back to the XLA matcher",
                RuntimeWarning,
                stacklevel=2,
            )
            matcher = "xla"

    key = jax.random.PRNGKey(cfg.seed)
    accs = []
    done = 0
    # Every step runs at the full episodes_per_step shape — the tail step is
    # padded (episodes past n_episodes computed, truncated on host) so any
    # n_episodes compiles exactly ONE device program (matching
    # evaluate_sharded; a second trace is 20-40 min on the tunneled dev
    # chip). base_ordinal is traced, so step position never retraces.
    while done < cfg.n_episodes:
        acc = eval_step(
            key,
            jnp.int32(done),
            table.features,
            table.counts,
            vf,
            vc,
            n_way=cfg.n_way,
            k_shot=cfg.k_shot,
            n_query=cfg.n_query,
            n_step=cfg.episodes_per_step,
            metric=cfg.metric,
            fusion=cfg.fusion,
            matcher=matcher,
        )
        take = min(cfg.episodes_per_step, cfg.n_episodes - done)
        accs.append(np.asarray(acc)[:take])
        done += take

    per_episode = np.concatenate(accs)
    mean = float(per_episode.mean())
    # 95% CI of the mean: 1.96 * sample std / sqrt(E)  (reference C10 rule)
    std = float(per_episode.std(ddof=1)) if len(per_episode) > 1 else 0.0
    ci = 1.96 * std / np.sqrt(len(per_episode))
    return EvalResult(mean_acc=mean, ci95=float(ci), per_episode=per_episode)
