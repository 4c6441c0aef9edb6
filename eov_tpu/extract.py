"""Clip feature extraction pipeline: decode -> preprocess -> backbone -> store.

Capability parity: reference component C6 + call stack §3.1 (SURVEY.md):
iterate a dataset, TSN-sample K segment frames per clip, run the backbone,
mean-pool segments into one 2048-d clip feature, persist to the feature
cache.

TPU-first (BASELINE.json:5,11):
* The transform chain + backbone + consensus is ONE jitted device program
  (`make_feature_fn`): uint8 frames in, clip features out — uint8 over PCIe
  (4x less transfer than f32), resize/crop/normalize fused on device.
* Host decode overlaps device compute via JAX's async dispatch: batch i's
  result is materialized only after batch i+1 is decoded and enqueued
  (software double-buffering; the native clip loader in runtime/ extends
  this with threaded readahead). `deterministic=True` serializes for tests
  (SURVEY.md §5 race detection).
* Failure containment (SURVEY.md §5): decode errors skip-and-log instead of
  killing a pod job; `fault_inject` exercises that path deterministically.
* Resume: clips already in the store's manifest are skipped (§5 recovery).
"""

from __future__ import annotations

import dataclasses
import logging
import threading
from collections import OrderedDict
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from eov_tpu.data.datasets import VideoDataset, VideoRecord
from eov_tpu.data.segments import center_indices_np as _center_indices_np
from eov_tpu.data.store import FeatureStore
from eov_tpu.models import feature_apply, get_arch
from eov_tpu.ops import preprocess
from eov_tpu.utils.metrics import MetricsWriter, Timer

__all__ = ["ExtractConfig", "make_feature_fn", "extract_features"]

log = logging.getLogger("eov.extract")


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    num_segments: int = 8          # K, BASELINE.json:8
    arch: str = "resnet50"         # backbone (models.ARCHS)
    batch_clips: int = 16          # clips per device batch
    scale_size: int = 256
    crop_size: int = 224
    compute_dtype: str = "bfloat16"  # backbone MXU dtype
    fold_bn: bool = True           # fold inference BN into conv kernels
    pallas_crop: bool = True       # fused Pallas crop+normalize on TPU when
                                   # frames are storage-normalized (short
                                   # side == scale_size, so resize is a no-op)
    stem_s2d: bool = False         # MXU-friendly space-to-depth stem rewrite
    fused_stages: tuple | str = "auto"
                                   # ResNet stages (1-based) to run through
                                   # the VMEM-resident Pallas bottleneck
                                   # stack (ops/pallas_bottleneck.py);
                                   # requires fold_bn, bottleneck archs.
                                   # "auto" = (1,) on TPU, () elsewhere —
                                   # the measured optimum (BASELINE.md r2:
                                   # stage 1 +2.3%, stages 1+2 negative).
    fused_group: int = 2           # images per fused-kernel grid step AT
                                   # THE FIRST fused stage (op-interleaved
                                   # independent chains; measured optimum 2
                                   # — BASELINE.md r2: 1452 vs 1438 at g=1,
                                   # 1412 at g=4). Later fused stages scale
                                   # it by their map-size ratio (row-
                                   # normalized grouping: stage 2 runs at
                                   # 4x this value) so every grid step
                                   # keeps ~the same matmul row count;
                                   # non-divisible batches degrade to 1
                                   # with a warning naming both values.
    flush_every: int = 64          # clips per durable shard
    deterministic: bool = False    # disable decode/compute overlap (tests)
    pad_batches: bool = False      # pad short tail batches to batch_clips
                                   # (sharded runs need divisible batches;
                                   # padded rows are dropped on materialize)
    fault_inject: float = 0.0      # P(decode failure) for failure-path tests
    fault_seed: int = 0
    pallas_pool: bool | str = False  # stem maxpool as a Pallas VMEM kernel
                                   # (ops/pallas_pool.py) instead of XLA
                                   # reduce_window; "fused" folds the pool
                                   # into the stage-1 stack kernel's entry
                                   # (needs stage 1 fused); fused path only
    quant: str | None = None       # None (bf16 production default) | "int8":
                                   # post-training int8 MXU convs
                                   # (models/quant_infer.py) — opt-in, and
                                   # accuracy-bounded per run by the paired
                                   # rails (tests/test_quant_infer.py)
    quant_calib_clips: int = 8     # calibration clips for the int8
                                   # activation scales
    quant_calib: str = "synthetic"  # "synthetic" (deterministic fixtures —
                                    # reproducible anywhere) | "dataset"
                                    # (first quant_calib_clips clips of the
                                    # extraction dataset — real-frame
                                    # deployment calibration). Either way
                                    # the computed scales are recorded in
                                    # the store manifest so classify
                                    # featurizes queries with the SAME
                                    # quantized program (quant_calibration/
                                    # FeatureStore.set_quant_calib).


def resolve_fused_stages(
    fused_stages: tuple | str, *, folded: bool, arch: str
) -> tuple:
    """Resolve ExtractConfig.fused_stages to a concrete stage tuple.

    "auto" picks the measured single-chip optimum — for bottleneck archs,
    stage 1 fused on TPU (BASELINE.md r2: +2.3%; stages 1+2 measured
    negative); for basic archs (resnet18/34) nothing (the r3 basic-stack
    measurement — see BASELINE.md family rows); nothing on other backends
    (the interpret-mode kernel is a parity tool, not a fast path).
    Explicit tuples are always honored, both families, interpret off-TPU.
    Fusion needs folded BN; otherwise resolves empty.
    """
    if not folded:
        return ()
    if fused_stages == "auto":
        if not get_arch(arch)[2]:
            return ()
        return (1,) if jax.default_backend() == "tpu" else ()
    return tuple(fused_stages or ())


# Process-wide host input-buffer ring (r3). Rationale: fresh >32 MB numpy
# buffers are munmapped on free (glibc), so a per-batch np.empty pays
# first-touch page faults every step — measured ~35 MB/s on the dev VM —
# and production input pipelines want a pinned ring regardless. Keyed by
# batch shape, capped at the pipeline depth actually used; LRU across
# shapes so a long-lived process cycling through many batch shapes
# (resolution buckets, tail batches) retains at most CAP×SHAPES dead
# buffers, not one stack per shape ever seen; locked so concurrent
# extract_features calls can't race the per-shape stacks.
_HOST_BUFS: "OrderedDict[tuple, list]" = OrderedDict()
_HOST_BUFS_LOCK = threading.Lock()
_HOST_BUFS_CAP = 3  # buffers retained per batch shape
_HOST_BUFS_SHAPES = 4  # distinct shapes retained (least-recent evicted)


def _take_buf(shape: tuple):
    with _HOST_BUFS_LOCK:
        stack = _HOST_BUFS.get(shape)
        if not stack:
            # Never keep an empty stack around: it holds no stock, yet it
            # would occupy a _HOST_BUFS_SHAPES LRU slot and could evict a
            # shape that still has live buffers. _put_buf recreates the
            # entry when a checked-out buffer comes back.
            if stack is not None:
                del _HOST_BUFS[shape]
            return None
        _HOST_BUFS.move_to_end(shape)
        buf = stack.pop()
        if not stack:
            del _HOST_BUFS[shape]
        return buf


def _put_buf(buf: np.ndarray) -> None:
    with _HOST_BUFS_LOCK:
        stack = _HOST_BUFS.setdefault(buf.shape, [])
        if len(stack) < _HOST_BUFS_CAP:
            stack.append(buf)
        _HOST_BUFS.move_to_end(buf.shape)
        while len(_HOST_BUFS) > _HOST_BUFS_SHAPES:
            _HOST_BUFS.popitem(last=False)




def _synthetic_act_max(folded_params, cfg: ExtractConfig) -> dict:
    """Calibrate int8 activation maxima on the deterministic synthetic
    fixtures (the always-available mode; identical scales for identical
    cfg in any environment)."""
    from eov_tpu.models.quant_infer import (
        calibrate_act_max, synthetic_calib_frames,
    )

    calib_u8 = synthetic_calib_frames(
        cfg.quant_calib_clips, cfg.num_segments,
        cfg.scale_size, cfg.scale_size,
    )
    calib_x = preprocess.preprocess_eval(
        jnp.asarray(calib_u8), scale_size=cfg.scale_size,
        crop_size=cfg.crop_size, dtype=jnp.float32,
    )
    return calibrate_act_max(folded_params, calib_x, arch=cfg.arch)


def quant_calibration(params, cfg: ExtractConfig, dataset=None) -> dict:
    """Per-conv-site int8 activation maxima as plain floats — the
    JSON-storable calibration provenance a FeatureStore records at extract
    time (``store.set_quant_calib``) so query runs reproduce the store's
    exact quantized program.

    ``cfg.quant_calib`` selects the source: ``"synthetic"`` (default —
    deterministic fixtures) or ``"dataset"`` (the first
    ``cfg.quant_calib_clips`` clips of ``dataset``, center-sampled and
    preprocessed exactly as extraction would — real-frame deployment
    calibration; synthetic gratings can undershoot real activation maxima
    and clip them at ±127·a_scale).
    """
    if cfg.quant_calib not in ("synthetic", "dataset"):
        raise ValueError(
            f"quant_calib={cfg.quant_calib!r}: expected 'synthetic' or "
            "'dataset'"
        )
    if not (cfg.fold_bn and "batch_stats" in params):
        raise ValueError(
            "quant calibration runs over the FOLDED forward: it needs "
            "fold_bn=True and raw params with batch_stats"
        )
    from eov_tpu.models.resnet import fold_batchnorm

    folded = fold_batchnorm(params)
    if cfg.quant_calib == "dataset":
        if dataset is None:
            raise ValueError(
                "quant_calib='dataset' needs the extraction dataset"
            )
        from eov_tpu.models.quant_infer import calibrate_act_max

        recs = list(dataset.records)[: cfg.quant_calib_clips]
        if not recs:
            raise ValueError("quant_calib='dataset': dataset has no records")
        xs = []
        for rec in recs:
            idx = _center_indices_np(rec.num_frames, cfg.num_segments)
            clip = dataset.get_frames(rec, idx)  # [K, h, w, 3] uint8
            xs.append(preprocess.preprocess_eval(
                jnp.asarray(clip)[None], scale_size=cfg.scale_size,
                crop_size=cfg.crop_size, dtype=jnp.float32,
            )[0])
        act = calibrate_act_max(folded, jnp.stack(xs), arch=cfg.arch)
    else:
        act = _synthetic_act_max(folded, cfg)
    return {k: float(v) for k, v in act.items()}


def make_feature_fn(params, cfg: ExtractConfig,
                    act_max: dict | None = None) -> Callable:
    """jitted: uint8 frames [B, K, H, W, 3] -> clip features [B, D].

    Fuses preprocess (resize-matmul + crop + normalize), the ResNet-50
    forward, and TSN mean consensus (C5) into one XLA program. Distinct
    input resolutions trigger one recompile each (shapes are static); frame
    storage should be resolution-normalized for production throughput.

    ``act_max`` (quant runs only): pre-computed per-conv-site activation
    maxima — pass :func:`quant_calibration`'s output, or the scales a
    FeatureStore recorded at extract time (``store.quant_calib()``), so a
    query run reproduces the exact quantized program that produced the
    store. ``None`` calibrates on synthetic fixtures here (the default
    behavior, identical scales for identical cfg).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    folded = cfg.fold_bn and "batch_stats" in params
    if folded:
        from eov_tpu.models.resnet import fold_batchnorm

        params = fold_batchnorm(params)
    if cfg.stem_s2d:
        from eov_tpu.models.resnet import space_to_depth_stem

        params = space_to_depth_stem(params)

    use_pallas = cfg.pallas_crop and jax.default_backend() == "tpu"
    fused_stages = resolve_fused_stages(
        cfg.fused_stages, folded=folded, arch=cfg.arch
    )
    if cfg.pallas_pool and not (folded and fused_stages):
        # The pool kernels live in the folded fused-stage forward
        # (models/folded_infer.py); on any other path the setting would
        # silently bench the default reduce_window as a "Pallas" result.
        log.warning(
            "pallas_pool=%r ignored: it requires fold_bn plus a resolved "
            "fused stage set (fused_stages=%r resolved to %r on %s/%s); "
            "the stem pool runs as XLA reduce_window",
            cfg.pallas_pool, cfg.fused_stages, fused_stages, cfg.arch,
            jax.default_backend(),
        )
    elif cfg.pallas_pool == "fused" and 1 not in fused_stages:
        # Fail at config time: folded_feature_apply would raise the same
        # refusal, but only at trace time on the FIRST batch — after the
        # dataset is built and decoded (and mid-collective in a pod run).
        raise ValueError(
            "pallas_pool='fused' requires stage 1 in the resolved fused "
            f"stages (fused_stages={cfg.fused_stages!r} resolved to "
            f"{fused_stages!r} on {cfg.arch}); use pallas_pool=True for "
            "the standalone kernel"
        )
    elif cfg.pallas_pool == "fused" and not get_arch(cfg.arch)[2]:
        # Same late-failure mode for basic archs: an explicit
        # fused_stages=(1,) on resnet18/34 passes the stage check above but
        # folded_feature_apply refuses pool-fusion at trace time (the
        # fused-entry pool exists only in the bottleneck stack).
        raise ValueError(
            "pallas_pool='fused' is implemented for bottleneck archs only "
            f"(arch={cfg.arch!r}); use pallas_pool=True for the standalone "
            "kernel"
        )
    qvars = None
    if cfg.quant is not None:
        # Post-training int8 path (models/quant_infer.py). Config-time
        # refusals mirror the pallas_pool policy above: every incompatible
        # combination fails here, before decode/setup (and before the first
        # trace in a pod run), never silently falls back.
        if cfg.quant != "int8":
            raise ValueError(
                f"quant={cfg.quant!r}: the only implemented scheme is 'int8'"
            )
        if not folded:
            raise ValueError(
                "quant='int8' quantizes the FOLDED inference path: it needs "
                "fold_bn=True and raw params with batch_stats (got "
                f"fold_bn={cfg.fold_bn}, batch_stats "
                f"{'present' if 'batch_stats' in params else 'absent'})"
            )
        if cfg.stem_s2d:
            raise ValueError(
                "quant='int8' composes with the standard stem only; the s2d "
                "kernel rewrite reshapes conv1's input layout "
                "(set stem_s2d=False)"
            )
        if cfg.pallas_pool:
            # The pool kernels live in the bf16 fused-stage forward only.
            log.warning(
                "quant='int8': pallas_pool=%r ignored — the int8 forward "
                "has no Pallas pool entry (stem pool runs as XLA "
                "reduce_window)", cfg.pallas_pool,
            )
        if cfg.fused_stages == "auto":
            # The int8 XLA conv walk is the measured production default
            # (BASELINE.md r5); the bf16 auto-set does not transfer. The
            # int8 fused stage-1 stack is explicit opt-in below.
            fused_stages = ()
        elif fused_stages:
            # Explicit fused_stages under quant: route stage 1 through the
            # int8 VMEM-resident stack (ops/pallas_bottleneck_int8.py).
            # Config-time refusals mirror quant_feature_apply's.
            if tuple(fused_stages) != (1,):
                raise ValueError(
                    "quant='int8' fused_stages supports (1,) only "
                    f"(got fused_stages={cfg.fused_stages!r})"
                )
            if not get_arch(cfg.arch)[2]:
                raise ValueError(
                    "quant='int8' fused stage-1 is implemented for "
                    f"bottleneck archs only (arch={cfg.arch!r})"
                )
        from eov_tpu.models.quant_infer import quantize_variables

        if act_max is None:
            act_max = _synthetic_act_max(params, cfg)
        try:
            qvars = quantize_variables(params, act_max)
        except KeyError as e:
            raise ValueError(
                f"calibration scales are missing conv site {e.args[0]!r} — "
                "were they computed for a different --arch than "
                f"{cfg.arch!r}? Recompute with extract.quant_calibration "
                "or drop act_max to recalibrate"
            )

    @jax.jit
    def feature_fn(frames_u8: jax.Array) -> jax.Array:
        h, w = frames_u8.shape[-3], frames_u8.shape[-2]
        if use_pallas and min(h, w) == cfg.scale_size:
            # Storage-normalized input: resize is identity, so the whole
            # transform chain is the fused Pallas crop+normalize kernel
            # (ops/pallas_preprocess.py — semantics-identical, parity-tested).
            from eov_tpu.ops.pallas_preprocess import crop_normalize

            x = crop_normalize(frames_u8, crop=cfg.crop_size, dtype=dtype)
        else:
            x = preprocess.preprocess_eval(
                frames_u8,
                scale_size=cfg.scale_size,
                crop_size=cfg.crop_size,
                dtype=dtype,
            )  # [B, K, 224, 224, 3]
        if qvars is not None:
            from eov_tpu.models.quant_infer import quant_feature_apply

            feats = quant_feature_apply(
                qvars, x, arch=cfg.arch, dtype=dtype,
                fused_stages=tuple(fused_stages),
                fused_group=cfg.fused_group,
                interpret=jax.default_backend() != "tpu",
            )  # [B, K, D]
        elif folded and fused_stages:
            from eov_tpu.models.folded_infer import folded_feature_apply

            feats = folded_feature_apply(
                params, x, arch=cfg.arch, dtype=dtype,
                fused_stages=fused_stages,
                fused_group=cfg.fused_group,
                stem_s2d=cfg.stem_s2d,
                pallas_pool=cfg.pallas_pool,
                interpret=jax.default_backend() != "tpu",
            )  # [B, K, D]
        else:
            feats = feature_apply(
                params, x, arch=cfg.arch, dtype=dtype, folded=folded,
                stem_s2d=cfg.stem_s2d,
            )  # [B, K, D]
        return jnp.mean(feats.astype(jnp.float32), axis=1)  # TSN consensus

    return feature_fn


def extract_features(
    dataset: VideoDataset,
    params,
    store: FeatureStore,
    cfg: ExtractConfig = ExtractConfig(),
    metrics: MetricsWriter | None = None,
    feature_fn: Callable | None = None,
    records: Sequence[VideoRecord] | None = None,
    mesh=None,
    act_max: dict | None = None,
) -> dict:
    """Run extraction over all records not yet in the store. Returns stats.

    feature_fn overrides the default ResNet-50 pipeline (tests swap in a
    cheap featurizer; the multi-chip path swaps in the sharded step from
    parallel/). records restricts the work list (multi-host jobs pass this
    host's shard from parallel.distributed.process_record_shard).

    mesh + an initialized multi-controller runtime (jax.process_count() > 1)
    switches to the pod (DCN) input path: per-host decoded batches are
    lifted into global arrays (host_batch_to_global), every host runs an
    agreed-on global step count (global_max — unequal per-host work would
    desync the collectives), and each host writes its own rows into its own
    store namespace (FeatureStore is multi-writer safe by shard prefix).
    """
    metrics = metrics or MetricsWriter(None)
    # act_max: recorded int8 calibration scales (see make_feature_fn) —
    # classify passes the SUPPORT store's scales so query featurization
    # reproduces the exact program that produced the store.
    feature_fn = feature_fn or make_feature_fn(params, cfg, act_max=act_max)
    done = store.done_ids()
    work = dataset.records if records is None else records
    todo = [r for r in work if r.video_id not in done]
    fault_rng = np.random.default_rng(cfg.fault_seed)
    multi = mesh is not None and jax.process_count() > 1

    stats = {"total": len(work), "skipped_done": len(work) - len(todo),
             "extracted": 0, "failed": 0}
    pending: tuple | None = None  # (records, feats_dev, host_buf | None)
    since_flush = 0
    timer = Timer()

    # Host buffer ring (r3, process-wide — see _HOST_BUFS): a batch's
    # buffer is recycled after its FEATURES materialize — by then its
    # host->device transfer is long done.

    def _materialize(p):
        nonlocal since_flush
        records, feats_dev, host_buf = p
        if multi:
            # Only this host's rows are addressable; they are exactly the
            # features of this host's local input rows (row-parallel step).
            from eov_tpu.parallel.distributed import host_local_rows

            feats = host_local_rows(feats_dev)
        else:
            feats = np.asarray(feats_dev)
        for rec, f in zip(records, feats):
            store.put(rec.video_id, f, rec.label)
        stats["extracted"] += len(records)
        since_flush += len(records)
        if since_flush >= cfg.flush_every:
            store.flush()
            since_flush = 0
        if host_buf is not None:
            _put_buf(host_buf)

    # Pooled decode fast path (native loader: one multi-threaded call per
    # batch, GIL released); per-record fallback keeps fault containment.
    can_pool = hasattr(dataset, "get_batch") and not cfg.fault_inject
    # Decide up front whether get_batch takes `out=` (buffer-ring reuse) —
    # introspection instead of try/except TypeError, which would also
    # swallow genuine TypeErrors raised INSIDE an out-accepting get_batch
    # and silently re-decode every batch without the ring. For
    # un-introspectable signatures (C callables) the first pooled call
    # probes out= and SETTLES the answer: a rejected probe retries that
    # same batch out-less and pins the out-less form for the rest of the
    # run, so the pooled fast path is never permanently lost to the
    # per-record fallback.
    accepts_out = probe_out = False
    if can_pool:
        from eov_tpu.data.datasets import get_batch_accepts_out

        known = get_batch_accepts_out(dataset.get_batch)
        accepts_out = True if known is None else known
        probe_out = known is None

    def _decode_batch(batch: list[VideoRecord], out_buf=None):
        """Returns (ok_records, clips) — clips is the stacked [B, K, H, W,
        3] array itself on the pooled path (no per-clip split + re-stack:
        that cost a full extra host copy + a fresh buffer per batch), or a
        list of per-clip arrays on the fallback path."""
        nonlocal accepts_out, probe_out
        if can_pool:
            try:
                idx = np.stack([
                    _center_indices_np(r.num_frames, cfg.num_segments)
                    for r in batch
                ])
                if accepts_out:
                    try:
                        arr = dataset.get_batch(batch, idx, out=out_buf)
                    except TypeError as te:
                        if not probe_out:
                            raise  # genuine error inside an out-accepting
                            # loader: surface via the per-record fallback
                        probe_out = accepts_out = False
                        # warning, not info: for an un-introspectable
                        # get_batch a genuine TypeError raised INSIDE an
                        # out-accepting loader is indistinguishable from a
                        # signature rejection — a mis-settle silently drops
                        # the buffer ring for the whole run, so the settle
                        # (with the actual error text) must be visible.
                        log.warning(
                            "get_batch rejected out= (%s); settling on the "
                            "out-less pooled form — if this TypeError came "
                            "from inside an out-accepting loader, the "
                            "buffer ring is disabled for this run", te)
                        arr = dataset.get_batch(batch, idx)
                    else:
                        probe_out = False  # out= accepted; answer settled
                else:  # out-less custom get_batch signature
                    arr = dataset.get_batch(batch, idx)
                return list(batch), arr
            except Exception as e:  # noqa: BLE001 — fall back per record
                log.warning("pooled decode failed (%s); per-record retry", e)
        oks, clips = [], []
        for rec in batch:
            try:
                if cfg.fault_inject and fault_rng.random() < cfg.fault_inject:
                    raise IOError(f"injected decode fault: {rec.video_id}")
                idx = _center_indices_np(rec.num_frames, cfg.num_segments)
                clips.append(dataset.get_frames(rec, idx))
                oks.append(rec)
            except Exception as e:  # noqa: BLE001 — containment by design
                stats["failed"] += 1
                log.warning("decode failed, skipping %s: %s", rec.video_id, e)
                metrics.write("decode_failure", video_id=rec.video_id, error=str(e))
        return oks, clips

    if multi:
        # --- pod (DCN) loop: fixed-shape global steps, host-lifted inputs.
        from eov_tpu.parallel import distributed as dist

        pc = jax.process_count()
        if cfg.batch_clips % pc:
            raise ValueError(
                f"global batch_clips={cfg.batch_clips} not divisible by "
                f"process_count={pc}"
            )
        lb = cfg.batch_clips // pc  # this host's rows of every global step
        if lb == 0:
            raise ValueError("batch_clips smaller than process_count")
        # Hosts hold different todo counts (strided shard ±1, resume skips);
        # all must dispatch the same number of collective programs.
        n_steps = dist.global_max(-(-len(todo) // lb))
        known: np.ndarray | None = None  # probe clip for dummy/pad batches

        def _probe_clip():
            rec = (todo or list(work) or list(dataset.records))[0]
            idx = _center_indices_np(rec.num_frames, cfg.num_segments)
            return dataset.get_frames(rec, idx)

        for s in range(n_steps):
            batch = todo[s * lb : (s + 1) * lb]
            buf = None
            if batch and len(batch) == lb and known is not None:
                buf = _take_buf((lb, *known.shape))
            oks, clips = _decode_batch(batch, buf) if batch else ([], [])
            pooled = isinstance(clips, np.ndarray)
            if buf is not None and not pooled:
                _put_buf(buf)  # unused
            if len(clips):
                shapes = (
                    {clips.shape[1:]} if pooled else {c.shape for c in clips}
                )
                if known is not None:
                    shapes.add(known.shape)
                if len(shapes) > 1:
                    raise ValueError(
                        "multi-host extraction requires resolution-"
                        f"normalized frame storage (saw {sorted(shapes)}); "
                        "pack with pack_eovc --short-side"
                    )
                # .copy(): clips[0] on the pooled path is a view into a
                # ring buffer that will be recycled.
                known = np.asarray(clips[0]).copy() if pooled else clips[0]
            elif known is None:
                known = _probe_clip()
            if pooled and len(clips) == lb:
                stacked = clips
                if buf is None:
                    # Fresh pooled allocation: seed the ring with it (it is
                    # recycled in _materialize, after the device has
                    # consumed it) — otherwise _take_buf never has stock
                    # and every batch re-pays first-touch page faults.
                    buf = clips
            else:
                stacked = (
                    np.stack(list(clips)) if len(clips)
                    else np.zeros((0, *known.shape), np.uint8)
                )
                buf = None  # freshly stacked; nothing to recycle
            if len(clips) < lb:  # pad to the fixed local batch shape
                pad_src = stacked[-1:] if len(clips) else known[None]
                stacked = np.concatenate(
                    [stacked] + [pad_src] * (lb - len(clips))
                )
                buf = None
            frames = dist.host_batch_to_global(mesh, stacked)
            feats_dev = feature_fn(frames)  # async dispatch
            if cfg.deterministic:
                feats_dev.block_until_ready()
            if pending is not None:
                _materialize(pending)
            pending = (oks, feats_dev, buf)
            metrics.write(
                "extract_batch", n=len(oks), failed=len(batch) - len(oks),
                seconds=timer.lap(),
            )
        if pending is not None:
            _materialize(pending)
        store.flush()
        dist.barrier("eov_extract_done")
        metrics.write("extract_done", **stats)
        return stats

    seen_shapes: set[tuple] = set()
    known_clip_shape: tuple | None = None
    for start in range(0, len(todo), cfg.batch_clips):
        batch = todo[start : start + cfg.batch_clips]
        buf = None
        if can_pool and known_clip_shape is not None:
            buf = _take_buf((len(batch), *known_clip_shape))
        oks, clips = _decode_batch(batch, buf)
        pooled = isinstance(clips, np.ndarray)
        if buf is not None and not pooled:
            _put_buf(buf)  # unused
        if len(clips):
            hw = clips[0].shape[1:3] if not pooled else clips.shape[2:4]
            if pooled:
                known_clip_shape = clips.shape[1:]
            if hw not in seen_shapes:
                seen_shapes.add(hw)
                if len(seen_shapes) == 4:
                    # Each distinct resolution is a separate XLA compile
                    # (minutes on TPU). Production fix: size-normalize the
                    # storage (pack_eovc --short-side).
                    log.warning(
                        "4+ distinct frame resolutions seen (%s) — every new "
                        "shape recompiles the device program; pre-normalize "
                        "frame storage for throughput", sorted(seen_shapes),
                    )
        # Pooled path: one fixed-resolution array, no per-clip split +
        # re-stack (that cost a full extra host copy + a fresh buffer per
        # batch — r3). Fallback path: group by frame resolution, since
        # mixed-resolution datasets can't stack into one array.
        if pooled:
            groups = {clips.shape[2:4]: (oks, clips)}
        else:
            gd: dict[tuple, tuple[list, list]] = {}
            for rec, clip in zip(oks, clips):
                g = gd.setdefault(clip.shape[1:3], ([], []))
                g[0].append(rec)
                g[1].append(clip)
            groups = {
                k: (g_oks, np.stack(g_clips))
                for k, (g_oks, g_clips) in gd.items()
            }
        for g_oks, stacked in groups.values():
            # Pooled path: recycle the batch's host buffer once its
            # features materialize. A fresh allocation (buf None — ring
            # empty, e.g. the first two overlapped batches) seeds the ring.
            g_buf = (buf if buf is not None else clips) if pooled else None
            if cfg.pad_batches and len(stacked) < cfg.batch_clips:
                # Repeat the last clip up to the full batch; _materialize's
                # zip(records, feats) drops the padded rows.
                pad = np.repeat(
                    stacked[-1:], cfg.batch_clips - len(stacked), axis=0
                )
                stacked = np.concatenate([stacked, pad])
                g_buf = None  # padded copy; original tail buf not in flight
            frames = jnp.asarray(stacked)  # [B, K, H, W, 3] uint8
            feats_dev = feature_fn(frames)  # async dispatch — returns now
            if cfg.deterministic:
                feats_dev.block_until_ready()
            if pending is not None:
                _materialize(pending)  # overlap: prior batch drains while
            pending = (g_oks, feats_dev, g_buf)  # this one computes
        metrics.write(
            "extract_batch", n=len(oks), failed=len(batch) - len(oks),
            seconds=timer.lap(),
        )

    if pending is not None:
        _materialize(pending)
    store.flush()
    metrics.write("extract_done", **stats)
    return stats
