"""shard_map/pjit execution paths: pod extraction and multi-chip eval.

SURVEY.md §2c build plan: data parallelism is the primary strategy — shard
the clip batch (extraction, BASELINE.json:11) and the episode batch (eval,
BASELINE.json:10) over the 'data' mesh axis; optionally shard a clip's K
segment frames over the 'frame' axis and psum-mean-pool (the sequence-
parallel analog; one ICI collective). Collectives are XLA's (`psum`), not
hand-rolled rings — at 2048-d features the tree reduction XLA emits is
already bandwidth-optimal on ICI.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from eov_tpu import episodes as ep
from eov_tpu.models import feature_apply
from eov_tpu.ops import preprocess, similarity
from eov_tpu.parallel.mesh import DATA_AXIS, FRAME_AXIS

__all__ = ["make_sharded_feature_fn", "make_sharded_eval_step",
           "evaluate_sharded"]


def make_sharded_feature_fn(
    params,
    mesh: Mesh,
    *,
    scale_size: int = 256,
    crop_size: int = 224,
    compute_dtype=jnp.bfloat16,
    fold_bn: bool = True,
    arch: str = "resnet50",
    fused_stages: tuple | str = "auto",
    fused_group: int = 2,
    quant: str | None = None,
    act_max: dict | None = None,
) -> Callable:
    """Sharded clip featurizer: frames [B, K, H, W, 3] u8 -> features [B, D].

    B is sharded over 'data', K over 'frame'. Each device preprocesses and
    runs the backbone on its local [B/dp, K/fp] frame block, mean-pools its
    local segments, then one psum over 'frame' completes the TSN consensus
    (SURVEY.md §2c SP row: frame-axis sharding = one collective).
    Params are replicated (25M params ≪ HBM; §2c TP row). ``fused_stages``
    follows extract.resolve_fused_stages: per-device blocks run the Pallas
    fused bottleneck stack for those stages (the kernel is pure local
    compute, so it composes with shard_map unchanged).

    ``quant='int8'`` (r5) runs the post-training int8 forward
    (models/quant_infer.py) per device — quantization is pure local compute,
    so pod-scale int8 extraction is the same one-psum program. It requires
    ``act_max``, the per-conv-site calibration scales
    (extract.quant_calibration): every process must quantize with the SAME
    scales or the "replicated params" premise above silently breaks, so
    this function refuses to calibrate locally. Config-time refusals mirror
    extract.make_feature_fn's (fold_bn required; fused stages (1,) only,
    bottleneck archs only).
    """
    from eov_tpu.extract import resolve_fused_stages

    folded = fold_bn and "batch_stats" in params
    if folded:
        from eov_tpu.models.resnet import fold_batchnorm

        params = fold_batchnorm(params)
    interpret = jax.default_backend() != "tpu"
    # Host (numpy) leaves: multi-controller jit treats them as replicated
    # (every process passes the same values); committed single-device jax
    # arrays would be rejected as non-addressable on the other hosts.
    import numpy as np

    qvars = None
    if quant is not None:
        if quant != "int8":
            raise ValueError(
                f"quant={quant!r}: the only implemented scheme is 'int8'"
            )
        if not folded:
            raise ValueError(
                "quant='int8' quantizes the FOLDED inference path: it needs "
                "fold_bn=True and raw params with batch_stats"
            )
        if act_max is None:
            raise ValueError(
                "sharded quant='int8' needs pre-computed calibration scales "
                "(act_max=extract.quant_calibration(...)): every process "
                "must quantize with identical scales"
            )
        if fused_stages == "auto":
            # Match extract.make_feature_fn: the int8 XLA conv walk is the
            # measured production default (BASELINE.md r5); the int8 fused
            # stage-1 stack stays explicit opt-in.
            fused = ()
        else:
            fused = tuple(fused_stages) if fused_stages else ()
            if fused and fused != (1,):
                raise ValueError(
                    "quant='int8' fused_stages supports (1,) only "
                    f"(got {fused_stages!r})"
                )
            if fused:
                from eov_tpu.models import get_arch

                if not get_arch(arch)[2]:
                    raise ValueError(
                        "quant='int8' fused stage-1 is implemented for "
                        f"bottleneck archs only (arch={arch!r})"
                    )
        from eov_tpu.models.quant_infer import quantize_variables

        try:
            qvars = quantize_variables(params, act_max)
        except KeyError as e:
            raise ValueError(
                f"calibration scales are missing conv site {e.args[0]!r} — "
                f"were they computed for a different arch than {arch!r}?"
            )
        qvars = jax.tree.map(np.asarray, qvars)
    else:
        fused = resolve_fused_stages(fused_stages, folded=folded, arch=arch)

    # The variable tree rides as the shard_map ARGUMENT (not a closure
    # constant, which XLA would bake into the program): quantized tree
    # under int8, folded float params otherwise.
    params = qvars if qvars is not None else jax.tree.map(np.asarray, params)
    quantized = qvars is not None

    def local_fn(params, frames_u8):
        x = preprocess.preprocess_eval(
            frames_u8, scale_size=scale_size, crop_size=crop_size,
            dtype=compute_dtype,
        )
        if quantized:
            from eov_tpu.models.quant_infer import quant_feature_apply

            feats = quant_feature_apply(
                params, x, arch=arch, dtype=compute_dtype,
                fused_stages=fused, fused_group=fused_group,
                interpret=interpret,
            )
        elif fused:
            from eov_tpu.models.folded_infer import folded_feature_apply

            feats = folded_feature_apply(
                params, x, arch=arch, dtype=compute_dtype,
                fused_stages=fused, fused_group=fused_group,
                interpret=interpret,
            )
        else:
            feats = feature_apply(
                params, x, arch=arch, dtype=compute_dtype, folded=folded
            )
        # Local segment sum; global mean via frame-axis psum.
        local_sum = jnp.sum(feats.astype(jnp.float32), axis=1)
        total = jax.lax.psum(local_sum, FRAME_AXIS)
        k_local = frames_u8.shape[1]
        k_global = k_local * jax.lax.psum(1, FRAME_AXIS)
        return total / k_global

    mapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, FRAME_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(functools.partial(mapped, params))


def make_sharded_eval_step(
    mesh: Mesh,
    *,
    n_way: int,
    k_shot: int,
    n_query: int,
    episodes_per_step: int,
    metric: str = "cosine",
    fusion: str = "max",
    embodied: bool = False,
) -> Callable:
    """Multi-chip eval step: E episodes sharded over 'data'.

    The feature table is replicated (C·M·D is MBs); each device samples and
    scores its E/dp episodes locally — the only communication is the [E]
    accuracy all-gather XLA inserts at the output. Episode randomness is the
    canonical ordinal protocol (episodes.py): shard s covers global ordinals
    base + s·e_local + [0, e_local), so the gathered [E] vector is in global
    ordinal order and BIT-IDENTICAL to single-chip eval.evaluate for the
    same seed — independent of mesh size and episodes_per_step
    (SURVEY.md §4.5: sharded == single-device results exactly).

    With ``embodied=True`` the step takes two extra args — the class-aligned
    virtual bank [C, V, D] and its counts [C] (embodied.align_virtual_bank)
    — and appends masked virtual members to each way's support (C9).
    """
    dp = mesh.shape[DATA_AXIS]
    if episodes_per_step % dp:
        raise ValueError(
            f"episodes_per_step={episodes_per_step} not divisible by data={dp}"
        )
    e_local = episodes_per_step // dp

    def local_step(key, base_ordinal, features, counts, virtual_feats,
                   virtual_counts):
        shard = jax.lax.axis_index(DATA_AXIS)
        idx = ep.sample_episodes(
            key,
            counts,
            n_way=n_way,
            k_shot=k_shot,
            n_query=n_query,
            n_episodes=e_local,
            max_clips=features.shape[1],
            base_ordinal=base_ordinal + shard * e_local,
        )
        sup = features[idx.class_ids[..., None], idx.support_idx]
        qry = features[idx.class_ids[..., None], idx.query_idx]
        mask = jnp.ones(sup.shape[:-1], jnp.float32)
        if virtual_feats is not None:
            virt = virtual_feats[idx.class_ids]
            vmask = (
                jnp.arange(virtual_feats.shape[1], dtype=jnp.int32)[None, None]
                < virtual_counts[idx.class_ids][..., None]
            ).astype(jnp.float32)
            sup = jnp.concatenate([sup, virt], axis=2)
            mask = jnp.concatenate([mask, vmask], axis=2)
        qry_flat = qry.reshape(e_local, n_way * n_query, -1)
        preds = similarity.predict(
            qry_flat, sup, mask, metric=metric, fusion=fusion
        )
        labels = ep.query_labels(n_way, n_query)[None, :]
        local_acc = jnp.mean((preds == labels).astype(jnp.float32), axis=-1)
        # Explicit [E] accuracy all-gather (the step's ONLY collective):
        # a replicated output is addressable on every host, which the
        # multi-controller caller needs to materialize the full vector.
        return jax.lax.all_gather(local_acc, DATA_AXIS, tiled=True)

    n_in = 6 if embodied else 4
    if not embodied:
        def local_step4(key, base_ordinal, features, counts):  # noqa: E306
            return local_step(key, base_ordinal, features, counts, None, None)
        fn = local_step4
    else:
        fn = local_step
    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(P() for _ in range(n_in)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def evaluate_sharded(table, cfg, mesh: Mesh, virtual=None):
    """Full eval protocol over a mesh: E episodes in sharded device steps.

    Multi-chip counterpart of eval.evaluate (same EvalConfig / EvalResult /
    CI math); episodes shard over 'data'. The canonical ordinal protocol
    makes per_episode BIT-IDENTICAL to single-chip evaluate for the same
    seed (episodes.py). episodes_per_step must divide by the data-axis
    size; the tail step is padded up to a full step and truncated on host.
    """
    import numpy as np

    from eov_tpu.eval import EvalResult

    # Same host-side guards as the single-chip evaluate(): inside jit the
    # sampler cannot raise, and with < n_way eligible classes it would
    # silently score invalid slots.
    if cfg.embodied and virtual is None:
        raise ValueError("embodied eval requires a virtual FeatureTable")
    if cfg.embodied and virtual is not None:
        d_real = table.features.shape[-1]
        d_virt = virtual.features.shape[-1]
        if d_real != d_virt:
            # Without this the mismatch surfaces as an opaque XLA shape
            # error at trace time inside shard_map.
            raise ValueError(
                f"real ({d_real}-d) and virtual ({d_virt}-d) features were "
                "extracted with different backbones; re-extract one side"
            )
    need = cfg.k_shot + cfg.n_query
    n_eligible = int(np.sum(np.asarray(table.counts) >= need))
    if n_eligible < cfg.n_way:
        raise ValueError(
            f"only {n_eligible} classes have >= {need} clips; "
            f"n_way={cfg.n_way} episodes are not sampleable"
        )
    if cfg.matcher == "pallas":
        import warnings

        warnings.warn(
            "matcher='pallas' is a single-chip bench path; the sharded "
            "eval step always runs the XLA matcher (identical results — "
            "the two are parity-tested)",
            RuntimeWarning,
            stacklevel=2,
        )

    dp = mesh.shape[DATA_AXIS]
    e_step = max(dp, cfg.episodes_per_step - cfg.episodes_per_step % dp)
    step = make_sharded_eval_step(
        mesh, n_way=cfg.n_way, k_shot=cfg.k_shot, n_query=cfg.n_query,
        episodes_per_step=e_step, metric=cfg.metric, fusion=cfg.fusion,
        embodied=cfg.embodied,
    )
    key = jax.random.PRNGKey(cfg.seed)
    # Replicated host inputs (see make_sharded_feature_fn): required under
    # multi-controller jax, free single-process. Every host holds the full
    # merged table (C*M*D is MBs), so eval needs no input sharding at all —
    # only the [E] accuracy output is data-sharded.
    features = np.asarray(table.features)
    counts = np.asarray(table.counts)
    args = ()
    if cfg.embodied:
        if virtual is None:
            raise ValueError("embodied eval requires a virtual FeatureTable")
        args = (np.asarray(virtual.features), np.asarray(virtual.counts))

    key_np = np.asarray(key)
    accs, done = [], 0
    while done < cfg.n_episodes:
        acc = np.asarray(
            step(key_np, np.int32(done), features, counts, *args)
        )
        take = min(e_step, cfg.n_episodes - done)
        accs.append(acc[:take])
        done += take
    per_episode = np.concatenate(accs)
    mean = float(per_episode.mean())
    std = float(per_episode.std(ddof=1)) if len(per_episode) > 1 else 0.0
    ci = 1.96 * std / np.sqrt(len(per_episode))
    return EvalResult(mean_acc=mean, ci95=float(ci), per_episode=per_episode)
