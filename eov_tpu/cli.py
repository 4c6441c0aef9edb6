"""CLI entry points — capability parity with the reference's scripts (C13).

SURVEY.md §1 L6: the reference exposes argparse scripts for feature
extraction, one-shot eval (plain + embodied), and finetune. Equivalents:

    eov extract   — dataset -> clip features into a FeatureStore
    eov eval      — episodic one-shot eval over a FeatureStore (+ embodied)
    eov classify  — classify NEW clips against a support store (deployment)
    eov episode   — config-1 single episode from raw clips, end to end
    eov train     — TSN finetune on meta-train classes (ckpt/resume per epoch)
    eov test      — video-level classification accuracy of a finetuned ckpt
    eov store-info — merged summary of a FeatureStore (clips/dtype/shards)
    eov fixtures  — materialize a synthetic frame-folder dataset (JPEGs)
    eov presets   — list checked-in config presets
    eov bench     — headline throughput benchmark (bench.py)

extract/eval/train take --multichip (mesh over all chips, parallel/);
every subcommand takes --trace DIR (xprof), --debug-nans, --platform, and
logs its resolved config + results to --metrics jsonl (SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default="ucf101_600",
                   help="config preset (see eov_tpu/config.py)")
    p.add_argument("--metrics", default=None, help="metrics.jsonl path")
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu/tpu)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace (xprof/TensorBoard)")
    p.add_argument("--debug-nans", action="store_true", dest="debug_nans",
                   help="enable jax_debug_nans (SURVEY.md §5 sanitizers)")


def _fused_stages_spec(s: str) -> str:
    """argparse validator for --fused-stages (fail fast at parse time)."""
    if s != "auto":
        try:
            tuple(int(v) for v in s.replace("none", "").split(",") if v)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"invalid --fused-stages {s!r}: expected 'auto', 'none', "
                "or a comma list like '1' / '1,2'"
            )
    return s


def _positive_int(s: str) -> int:
    v = int(s)
    if v < 1:
        raise argparse.ArgumentTypeError(f"expected a positive int, got {s}")
    return v


def _setup_platform(args) -> None:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    # Persistent compile cache (utils/compile_cache.py — verified working
    # through the tunneled chip). Opt out with JAX_COMPILATION_CACHE_DIR="".
    from eov_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def _load_dataset(args):
    from eov_tpu.data import datasets

    def class_filtered(ds):
        # Generic class-level one-shot restriction (C11), e.g.
        # --class-split eov_tpu/splits/ucf101_oneshot.json:test
        spec = getattr(args, "class_split", None)
        if not spec:
            return ds
        from eov_tpu.data import class_splits as cs

        path, _, part = spec.partition(":")
        doc = cs.load_class_split(path)
        return cs.filter_dataset_by_classes(
            ds, doc["class_splits"][part or "test"]
        )

    if args.dataset == "synthetic":
        return class_filtered(datasets.SyntheticVideoDataset(
            n_classes=args.synthetic_classes,
            clips_per_class=args.synthetic_clips,
            seed=args.seed,
            virtual=getattr(args, "synthetic_virtual", False),
        ))
    if args.dataset == "eovc":
        if not args.root:
            raise SystemExit("--root (file or shard dir) required for eovc")
        names = None
        if args.split and args.split.endswith(".json"):
            names = datasets.load_split_json(args.split)["class_names"]
        return class_filtered(
            datasets.EovcVideoDataset(
                args.root, class_names=names,
                jpeg_scale_denom=getattr(args, "jpeg_scale_denom", 1),
            )
        )
    if args.dataset == "videodir":
        # Source video files directly (C14 online path): root/<class>/<vid>,
        # or --split lists of (relative path, num_frames, label) where
        # num_frames <= 0 probes the container.
        if not args.root:
            raise SystemExit("--root required for videodir")
        split = names = only = None
        if args.split:
            if args.split.endswith(".json"):
                meta = datasets.load_split_json(args.split)
                split = meta["splits"][args.split_name]
                names = meta["class_names"]
            else:
                split = datasets.load_split_txt(args.split)
        elif getattr(args, "class_split", None):
            # Restrict directory discovery up front: probing frame counts
            # opens every container, and class_filtered would drop the
            # other classes' records right after.
            from eov_tpu.data import class_splits as cs

            path, _, part = args.class_split.partition(":")
            doc = cs.load_class_split(path)
            only = doc["class_splits"][part or "test"]
        return class_filtered(
            datasets.VideoFileDataset(args.root, split, names,
                                      only_classes=only)
        )
    if args.dataset == "framedir":
        if not (args.root and args.split):
            raise SystemExit("--root and --split required for framedir")
        if args.split.endswith(".json"):
            meta = datasets.load_split_json(args.split)
            split = meta["splits"][args.split_name]
            names = meta["class_names"]
        else:
            split = datasets.load_split_txt(args.split)
            names = [str(i) for i in range(max(s[2] for s in split) + 1)]
        if getattr(args, "class_split", None):
            from eov_tpu.data import class_splits as cs

            path, _, part = args.class_split.partition(":")
            doc = cs.load_class_split(path)
            keep = doc["class_splits"][part or "test"]
            split, names = cs.filter_split_by_classes(split, names, keep)
        return datasets.FrameFolderDataset(args.root, split, names)
    raise SystemExit(f"unknown dataset {args.dataset}")


def _resolve_ckpt_dir(path: str, select: str = "latest") -> str:
    """Resolve a train-run directory to one epoch's checkpoint dir.

    ``latest`` (default) picks the newest ``step_N`` dir — or the path
    itself when it is already a single checkpoint. ``best`` reads the
    run's ``best.json`` (written by ``eov train --val-class-split``: the
    epoch with the highest META-VAL one-shot accuracy, the reference
    lineage's model-selection rule) and refuses loudly when the run was
    trained without validation.
    """
    from eov_tpu.utils.checkpoint import latest_step_dir

    if not os.path.isdir(path):
        return path
    if select == "best":
        bj = os.path.join(path, "best.json")
        if not os.path.exists(bj):
            raise SystemExit(
                f"--select best: no best.json under {path} — train with "
                "--val-class-split to record per-epoch meta-val accuracy"
            )
        with open(bj) as f:
            doc = json.load(f)
        return os.path.join(path, doc["dir"])
    return latest_step_dir(path) or path


def _load_params(args, dtype_str: str):
    import jax
    import jax.numpy as jnp

    from eov_tpu.models import get_arch

    arch = getattr(args, "arch", None) or "resnet50"
    ctor, stage_sizes, bottleneck = get_arch(arch)
    model = ctor(dtype=jnp.dtype(dtype_str))
    if args.params:
        if args.params.endswith((".pth", ".pt", ".npz")):
            from eov_tpu.tools.port_torch import port_resnet_state_dict

            if args.params.endswith(".npz"):
                import numpy as np

                sd = dict(np.load(args.params))
            else:
                import torch

                sd = torch.load(args.params, map_location="cpu",
                                weights_only=True)
            try:
                return port_resnet_state_dict(
                    sd, stage_sizes=stage_sizes, bottleneck=bottleneck
                )
            except (ValueError, KeyError) as e:
                # Porter refusals (unconsumed donor keys = mismatched arch,
                # or missing keys) are user errors: exit clean, no traceback.
                raise SystemExit(
                    f"--params {os.path.basename(args.params)} does not "
                    f"port as arch {arch}: {e}"
                ) from None
        from eov_tpu.utils.checkpoint import load_pytree

        path = _resolve_ckpt_dir(
            args.params, getattr(args, "select", None) or "latest"
        )
        tree = load_pytree(path)
        # Train checkpoints also carry step/opt_state; the model apply only
        # takes variable collections.
        return {k: v for k, v in tree.items()
                if k in ("params", "batch_stats")}
    print(
        "warning: no --params given; using RANDOM ImageNet-free weights "
        "(fixture mode — accuracy will not match pretrained parity)",
        file=sys.stderr,
    )
    return model.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, 224, 224, 3)))


def cmd_extract(args) -> int:
    _setup_platform(args)
    from eov_tpu.config import get_preset, resolved_dict
    from eov_tpu.data.store import FeatureStore
    from eov_tpu.extract import extract_features
    from eov_tpu.utils.metrics import MetricsWriter

    if args.multichip:
        # Multi-controller init must precede the first backend use below
        # (_load_params touches devices); auto-detects pod environments,
        # no-op single-process (parallel/distributed.py).
        from eov_tpu.parallel import distributed as dist

        dist.initialize()

    preset = get_preset(args.preset)
    dataset = _load_dataset(args)
    params = _load_params(args, preset.extract.compute_dtype)
    metrics = MetricsWriter(args.metrics)

    cfg, feature_fn, records, mesh = preset.extract, None, None, None
    import dataclasses as _dc

    if args.arch:
        cfg = _dc.replace(cfg, arch=args.arch)
    if getattr(args, "num_segments", None):
        cfg = _dc.replace(cfg, num_segments=args.num_segments)
    if getattr(args, "batch", None):
        cfg = _dc.replace(cfg, batch_clips=args.batch)
    if getattr(args, "fused_stages", None) is not None:
        spec = args.fused_stages
        if spec == "auto":
            # Explicitly restore auto-resolution: the flag must win even
            # over a preset/config that pinned explicit stages (ADVICE r2).
            cfg = _dc.replace(cfg, fused_stages="auto")
        else:
            stages = tuple(
                int(v) for v in spec.replace("none", "").split(",") if v
            )
            cfg = _dc.replace(cfg, fused_stages=stages)
    if getattr(args, "fused_group", None) is not None:
        cfg = _dc.replace(cfg, fused_group=args.fused_group)
    if getattr(args, "pallas_pool", None) is not None:
        cfg = _dc.replace(
            cfg,
            pallas_pool={"off": False, "on": True, "fused": "fused"}[
                args.pallas_pool
            ],
        )
    if getattr(args, "quant", None) is not None:
        cfg = _dc.replace(
            cfg, quant=None if args.quant == "off" else args.quant
        )
    if getattr(args, "quant_calib", None) is not None:
        if not cfg.quant:
            raise SystemExit(
                "--quant-calib only applies with --quant int8"
            )
        cfg = _dc.replace(cfg, quant_calib=args.quant_calib)
    act_max = None
    if cfg.quant:
        # Compute the int8 calibration scales ONCE (synthetic fixtures, or
        # the dataset's own clips under --quant-calib dataset) and record
        # them in the manifest: classify reads them back so its query
        # featurization is the exact program that produced this store.
        # Under --multichip the calibration inputs are deterministic and
        # identical on every host (full-dataset prefix / fixtures), so all
        # processes derive the SAME scales — the sharded featurizer's
        # replicated-quantized-params premise (parallel/sharded.py).
        from eov_tpu.extract import quant_calibration

        act_max = quant_calibration(
            params, cfg,
            dataset if cfg.quant_calib == "dataset" else None,
        )
    if args.multichip:
        # Config 5 (pod_extract): DP over all chips of all hosts — mesh from
        # parallel/, per-host record shard, batches padded to mesh-divisible.
        import dataclasses

        from eov_tpu.parallel import distributed as dist
        from eov_tpu.parallel.sharded import make_sharded_feature_fn

        mesh = dist.global_mesh(n_frame=preset.n_frame)
        n_data = mesh.shape["data"]
        batch = max(cfg.batch_clips, n_data)
        batch -= batch % n_data
        cfg = dataclasses.replace(cfg, batch_clips=batch, pad_batches=True)
        import jax.numpy as jnp

        feature_fn = make_sharded_feature_fn(
            params, mesh, scale_size=cfg.scale_size, crop_size=cfg.crop_size,
            compute_dtype=jnp.dtype(cfg.compute_dtype), arch=cfg.arch,
            fused_stages=cfg.fused_stages, fused_group=cfg.fused_group,
            quant=cfg.quant, act_max=act_max,
        )
        records = dist.process_record_shard(dataset.records)

    # The store is created AFTER the flag surface resolves so it records
    # the run's extraction-precision provenance (and refuses appending a
    # different precision into an existing store — data/store.py).
    try:
        store = FeatureStore(
            args.store, class_names=list(dataset.class_names),
            dtype=getattr(args, "store_dtype", None), quant=cfg.quant,
        )
    except ValueError as e:
        raise SystemExit(str(e))
    if act_max is not None:
        store.set_quant_calib(act_max)
    metrics.write("config", command="extract", config=resolved_dict(cfg),
                  multichip=bool(args.multichip))
    stats = extract_features(
        dataset, params, store, cfg, metrics,
        feature_fn=feature_fn, records=records, mesh=mesh, act_max=act_max,
    )
    print(json.dumps(stats))
    return 0


def cmd_eval(args) -> int:
    _setup_platform(args)
    import dataclasses

    import numpy as np

    if args.multichip:
        from eov_tpu.parallel import distributed as dist

        dist.initialize()  # before first backend use; pod auto-detect

    from eov_tpu.config import get_preset, resolved_dict
    from eov_tpu.data.store import FeatureStore
    from eov_tpu.embodied import align_virtual_bank
    from eov_tpu.eval import evaluate
    from eov_tpu.utils.metrics import MetricsWriter

    preset = get_preset(args.preset)
    cfg = preset.eval
    overrides = {}
    for field in ("n_way", "k_shot", "n_query", "n_episodes", "metric",
                  "fusion", "matcher", "seed"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    if args.embodied:
        overrides["embodied"] = True
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    store = FeatureStore(args.store)
    table = store.to_table()
    virtual = None
    if cfg.embodied:
        if not args.virtual_store:
            raise SystemExit("--virtual-store required for embodied eval")
        vstore = FeatureStore(args.virtual_store)
        # Embodied fusion compares real and virtual features in ONE
        # similarity space: a recorded extraction-precision mismatch
        # between the banks skews the union scoring — refuse (stores
        # without provenance stay warn-free here: nothing to check).
        rq, rk = store.recorded_quant()
        vq, vk = vstore.recorded_quant()
        if rk and vk and rq != vq:
            raise SystemExit(
                f"embodied eval mixes precisions: --store was extracted "
                f"with quant={rq or 'off'} but --virtual-store with "
                f"quant={vq or 'off'}; re-extract one bank so both match"
            )
        virtual = align_virtual_bank(
            store.class_names, vstore.class_names, vstore.to_table()
        )

    metrics = MetricsWriter(args.metrics)
    metrics.write("config", command="eval", config=resolved_dict(cfg),
                  multichip=bool(args.multichip))
    if args.multichip:
        from eov_tpu.parallel import distributed as dist
        from eov_tpu.parallel.sharded import evaluate_sharded

        res = evaluate_sharded(table, cfg, dist.global_mesh(), virtual=virtual)
    else:
        res = evaluate(table, cfg, virtual=virtual)
    metrics.write("eval_result", mean_acc=res.mean_acc, ci95=res.ci95,
                  n_episodes=len(res.per_episode))
    if getattr(args, "per_episode_out", None):
        # Per-episode accuracies for PAIRED protocol comparisons
        # (tools/compare_eval.py): the canonical ordinal protocol makes
        # episode g a pure function of (seed, protocol, table shape), so
        # two runs over the same store with the same seed/protocol score
        # the IDENTICAL episode sequence — e.g. plain vs --embodied, or
        # cosine vs euclidean — and can be compared episode-by-episode.
        doc = {
            "config": resolved_dict(cfg),
            "store": args.store,
            "counts": [int(c) for c in np.asarray(table.counts)],
            "mean_acc": res.mean_acc,
            "ci95": res.ci95,
            "per_episode": [float(a) for a in res.per_episode],
        }
        with open(args.per_episode_out, "w") as f:
            json.dump(doc, f)
        print(f"per-episode accuracies -> {args.per_episode_out}")
    print(res)  # "accuracy: MM.MM% +/- C.CC%" — reference-compatible line
    return 0


def cmd_classify(args) -> int:
    """Classify query clips against a one-shot support feature store.

    The deployment surface of one-shot recognition (SURVEY.md §2a C8/C9
    *applied*, where the reference only ships the protocol evaluation):
    every clip in --store is a support example of its class; each query
    clip from the dataset args is featurized with the same backbone and
    assigned the class with the best fused similarity (the eval matcher's
    exact rules — metric/fusion flags, --embodied virtual augmentation).
    Emits one JSON line per clip; when the query dataset carries labels
    over the same class names, a final accuracy summary is printed.
    """
    _setup_platform(args)
    import numpy as np

    from eov_tpu.config import get_preset, resolved_dict
    from eov_tpu.data.store import FeatureStore, MemoryFeatureStore
    from eov_tpu.embodied import union_support
    from eov_tpu.extract import extract_features
    from eov_tpu.ops import similarity as sim
    from eov_tpu.utils.metrics import MetricsWriter

    preset = get_preset(args.preset)
    cfg = preset.extract
    import dataclasses as _dc

    if args.arch:
        cfg = _dc.replace(cfg, arch=args.arch)
    # Query featurization must match how the SUPPORT store was extracted —
    # mirror extract's override surface.
    if getattr(args, "num_segments", None):
        cfg = _dc.replace(cfg, num_segments=args.num_segments)
    if getattr(args, "batch", None):
        cfg = _dc.replace(cfg, batch_clips=args.batch)
    if getattr(args, "quant", None) is not None:
        cfg = _dc.replace(
            cfg, quant=None if args.quant == "off" else args.quant
        )
    # Matcher rules default to the PRESET's eval protocol (flags override):
    # classify promises the rules the store's accuracy was validated under,
    # and e.g. kinetics_5shot's protocol is prototype-mean, not max.
    metric = args.metric or preset.eval.metric
    fusion = args.fusion or preset.eval.fusion
    store = FeatureStore(args.store)
    class_names = store.class_names
    # Pad the table to the full class axis: a trailing class with no
    # extracted clips must stay a masked row (count 0), not shrink the
    # table — the virtual-bank concat and the prediction class axis both
    # index class_names.
    table = store.to_table(n_classes=len(class_names) or None)
    if args.embodied and not args.virtual_store:
        raise SystemExit("--virtual-store required for --embodied")
    vstore = FeatureStore(args.virtual_store) if args.embodied else None
    # Precision-provenance guard: matching int8-extracted support features
    # against bf16 query features (or vice versa) silently skews every
    # similarity — refuse a recorded mismatch, warn when the store predates
    # provenance (pre-r5 / imported caches record no 'quant').
    for s, role in [(store, "support"), (vstore, "virtual")]:
        if s is None:
            continue
        rq, rq_known = s.recorded_quant()
        if rq_known and rq != cfg.quant:
            raise SystemExit(
                f"{role} store {s.root} was extracted with "
                f"quant={rq or 'off'} but queries would be featurized with "
                f"quant={cfg.quant or 'off'}; pass --quant {rq or 'off'} "
                "or re-extract the store at the query precision"
            )
        if not rq_known and cfg.quant:
            print(
                f"warning: {role} store {s.root} records no extraction "
                "precision (pre-provenance or imported store); cannot "
                f"verify it matches --quant {cfg.quant}",
                file=sys.stderr,
            )
    try:
        feats, mask = union_support(
            table, class_names,
            vstore.class_names if vstore else None,
            vstore.to_table() if vstore else None,
        )
    except ValueError as e:
        raise SystemExit(str(e))

    # Featurize the queries through the production extract pipeline (same
    # preprocessing + backbone program as the support features should have
    # used; a dimension mismatch below means they didn't). Queries are
    # consumed right here, so they stay in memory — no tempdir store.
    params = _load_params(args, cfg.compute_dtype)
    dataset = _load_dataset(args)
    qstore = MemoryFeatureStore(class_names=list(dataset.class_names))
    # Under --quant, featurize queries with the SUPPORT store's recorded
    # calibration scales (the exact quantized program that produced it).
    # A store that records quant=int8 but carries NO scales (imported
    # caches, pre-scales r5 stores) falls back to local synthetic
    # calibration — exact for this repo's own pre-scales stores (same
    # deterministic fixtures), unverifiable for imported ones, so say so.
    act_max = store.quant_calib() if cfg.quant else None
    if cfg.quant and act_max is None:
        print(
            f"warning: support store {store.root} records no calibration "
            "scales; queries are featurized with locally recalibrated "
            "(synthetic-fixture) scales, which may not match the program "
            "that produced an imported store",
            file=sys.stderr,
        )
    stats = extract_features(dataset, params, qstore, cfg, act_max=act_max)
    qfeats = qstore.load_all()  # video_id -> (feature, label)
    if not qfeats:
        raise SystemExit("no query clips could be featurized")
    d_q = next(iter(qfeats.values()))[0].shape[-1]
    if d_q != feats.shape[-1]:
        raise SystemExit(
            f"query features are {d_q}-d but the support store holds "
            f"{feats.shape[-1]}-d; use the same --arch/--params as extract"
        )

    ids = sorted(qfeats.keys())
    q = np.stack([qfeats[v][0] for v in ids])  # [Q, D]
    scores = np.array(  # writable copy: ineligible classes masked below
        sim.fused_class_scores(q, feats, mask, metric=metric, fusion=fusion)
    )  # [Q, N]
    # Classes with NO support members (real or virtual) are not assignable:
    # fusion='mean' would otherwise score the zero prototype (0 cosine can
    # beat every real class for an orthogonal-ish query) — the eval
    # harness's eligibility guard (eval.py) applied to classification.
    eligible = np.asarray(mask).sum(axis=1) > 0
    if not eligible.any():
        raise SystemExit("support store has no classes with any clips")
    scores[:, ~eligible] = -np.inf
    preds = scores.argmax(axis=-1)

    metrics = MetricsWriter(args.metrics)
    metrics.write("config", command="classify", config=resolved_dict(cfg),
                  metric=metric, fusion=fusion,
                  n_support_classes=len(class_names), n_queries=len(ids),
                  failed=stats["failed"])
    if stats["failed"]:
        # Always surface drops — unlabeled deployment runs have no
        # accuracy summary to carry the count.
        print(
            f"warning: {stats['failed']} of {stats['total']} query clips "
            "failed to decode and are missing from the output",
            file=sys.stderr,
        )
    out_f = open(args.out, "w") if getattr(args, "out", None) else None
    try:
        for i, vid in enumerate(ids):
            rec = {
                "video_id": vid,
                "pred_class": class_names[int(preds[i])],
                "score": float(scores[i, preds[i]]),
            }
            line = json.dumps(rec)
            (out_f.write(line + "\n") if out_f else print(line))
    finally:
        if out_f:
            out_f.close()

    # Accuracy summary when query labels map onto the support classes.
    name_to_idx = {c: i for i, c in enumerate(class_names)}
    truths = [
        name_to_idx.get(dataset.class_names[qfeats[v][1]]) for v in ids
    ]
    known = [(p, t) for p, t in zip(preds, truths) if t is not None]
    if known:
        acc = float(np.mean([p == t for p, t in known]))
        metrics.write("classify_result", accuracy=acc, n=len(known),
                      failed=stats["failed"])
        print(f"labeled queries: {len(known)}/{len(ids)}, "
              f"accuracy {acc * 100:.2f}%", file=sys.stderr)
    return 0


def cmd_episode(args) -> int:
    """Config 1: one 5-way 1-shot episode from raw clips, batch 1, CPU."""
    _setup_platform(args)
    import numpy as np
    import jax.numpy as jnp

    from eov_tpu.config import get_preset
    from eov_tpu.extract import make_feature_fn
    from eov_tpu.ops import similarity

    preset = get_preset(args.preset)
    dataset = _load_dataset(args)
    params = _load_params(args, preset.extract.compute_dtype)
    ecfg = preset.extract
    if args.arch:
        import dataclasses as _dc

        ecfg = _dc.replace(ecfg, arch=args.arch)
    fn = make_feature_fn(params, ecfg)

    n_way = args.n_way or 5
    rng = np.random.default_rng(args.seed)
    by_class: dict[int, list] = {}
    for r in dataset.records:
        by_class.setdefault(r.label, []).append(r)
    classes = rng.choice(sorted(by_class), size=n_way, replace=False)

    def feat(rec):
        from eov_tpu.data.segments import center_indices_np as _center_indices_np

        idx = _center_indices_np(rec.num_frames, preset.extract.num_segments)
        frames = dataset.get_frames(rec, idx)[None]
        return np.asarray(fn(jnp.asarray(frames)))[0]

    sup, qry, truth = [], [], []
    for i, c in enumerate(classes):
        picks = rng.choice(len(by_class[c]), size=2, replace=False)
        sup.append(feat(by_class[c][picks[0]]))
        qry.append(feat(by_class[c][picks[1]]))
        truth.append(i)
    preds = np.asarray(
        similarity.predict(
            jnp.asarray(np.stack(qry)), jnp.asarray(np.stack(sup))[:, None, :]
        )
    )
    acc = float((preds == np.array(truth)).mean())
    print(json.dumps({"n_way": n_way, "accuracy": acc,
                      "preds": preds.tolist(), "truth": truth}))
    return 0


def _val_split_spec(spec: str) -> str:
    """Normalize a --val-class-split spec to default the partition to 'val'.

    Covers both the bare form 'path.json' AND the trailing-colon form
    'path.json:' — either would otherwise hit _load_dataset's bare-part
    default of 'test' and silently select models on the meta-TEST classes.
    """
    path, _, part = spec.partition(":")
    return f"{path}:{part or 'val'}"


def cmd_train(args) -> int:
    _setup_platform(args)
    if args.multichip:
        from eov_tpu.parallel import distributed as dist

        dist.initialize()  # before first backend use; pod auto-detect

    import jax
    import numpy as np

    from eov_tpu import train as eov_train
    from eov_tpu.config import resolved_dict
    from eov_tpu.utils.checkpoint import save_pytree
    from eov_tpu.utils.metrics import MetricsWriter

    dataset = _load_dataset(args)
    cfg = eov_train.TrainConfig(
        num_classes=len(dataset.class_names),
        arch=args.arch or "resnet50",
        num_segments=args.num_segments or 3,
        batch_clips=args.batch or 8,
        lr=args.lr or 0.001,
        scale_size=args.scale_size or 256,
        crop_size=args.crop_size or 224,
        seed=args.seed,
    )
    # Meta-val dataset for per-epoch one-shot model selection (the
    # reference lineage's rule): same dataset source, the val class
    # partition — disjoint classes from the meta-train ones above.
    val_dataset = None
    if getattr(args, "val_class_split", None):
        spec = _val_split_spec(args.val_class_split)
        vargs = argparse.Namespace(**{**vars(args), "class_split": spec})
        val_dataset = _load_dataset(vargs)
    import os

    from eov_tpu.utils.checkpoint import latest_step_dir, load_pytree

    metrics = MetricsWriter(args.metrics)
    metrics.write("config", command="train", config=resolved_dict(cfg))
    mesh = None
    if args.multichip:
        from eov_tpu.parallel import distributed as dist

        mesh = dist.global_mesh(n_frame=1)
        n_data = mesh.shape["data"]
        if cfg.batch_clips % n_data:
            import dataclasses as _dc

            cfg = _dc.replace(
                cfg,
                batch_clips=max(cfg.batch_clips - cfg.batch_clips % n_data,
                                n_data),
            )
    state = eov_train.create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    if args.params:
        # Warm start from pretrained/ported weights — the reference's
        # finetune workflow is ImageNet backbone + fresh fc head
        # (SURVEY.md §3.5); this flag was advertised but silently ignored
        # before r4. Backbone params/stats replace the random init; the fc
        # head stays freshly initialized unless the checkpoint carries one
        # of the right width. A resume checkpoint under --out (below)
        # takes precedence over the warm start.
        init = _load_params(args, cfg.compute_dtype)
        ip = dict(init.get("params", {}))
        fc = ip.get("fc")
        if fc is not None and (
            np.asarray(fc["kernel"]).shape[-1] != cfg.num_classes
        ):
            print(
                f"--params head is {np.asarray(fc['kernel']).shape[-1]}-way; "
                f"training {cfg.num_classes} classes — keeping a fresh fc",
                file=sys.stderr,
            )
            ip.pop("fc")
        missing = set(state.params) - set(ip) - {"fc"}
        if missing:
            raise SystemExit(
                f"--params is missing backbone modules {sorted(missing)[:4]}"
                f"... for arch {cfg.arch} — wrong --arch or checkpoint?"
            )
        extra = set(ip) - set(state.params)
        if extra:
            # e.g. a resnet101 checkpoint with --arch resnet50: resnet50's
            # modules are a subset, so 'missing' is empty — without this
            # guard the stray blocks merge into state.params and only fail
            # later as an opaque optax/fused-flatten tree mismatch.
            raise SystemExit(
                f"--params carries modules {sorted(extra)[:4]}... that "
                f"arch {cfg.arch} does not have — wrong --arch or "
                "checkpoint?"
            )

        def _leaf_shapes(tree):
            return {
                jax.tree_util.keystr(p): tuple(np.shape(v))
                for p, v in jax.tree_util.tree_leaves_with_path(tree)
            }

        # Module-name sets are necessary but not sufficient: resnet34 and
        # resnet50 share stage_sizes (3,4,6,3), so their top-level keys are
        # IDENTICAL — only the leaves differ (basic conv1/conv2 vs
        # bottleneck conv1..3/downsample, and the widths). Compare leaf
        # paths + shapes over the donor's modules.
        got = _leaf_shapes(ip)
        want = _leaf_shapes({k: state.params[k] for k in ip})
        bad = [k for k in sorted(set(got) | set(want))
               if got.get(k) != want.get(k)]
        if bad:
            raise SystemExit(
                f"--params does not match arch {cfg.arch}: "
                f"{len(bad)} leaves differ in presence or shape, e.g. "
                + ", ".join(
                    f"{k} {got.get(k, 'absent')} vs {want.get(k, 'absent')}"
                    for k in bad[:3]
                )
                + " — wrong --arch or checkpoint?"
            )
        state = eov_train.TrainState(
            step=state.step,
            params={**state.params, **ip},
            batch_stats={**state.batch_stats,
                         **init.get("batch_stats", {})},
            opt_state=state.opt_state,
        )
    start_epoch = 0
    if args.out:
        # Resume from the newest per-epoch checkpoint (reference parity:
        # torch.save each epoch — SURVEY.md §3.5; resume is the TPU-native
        # upgrade via the orbax step dirs).
        last = latest_step_dir(args.out)
        if last:
            restored = load_pytree(
                last,
                template={"params": state.params,
                          "batch_stats": state.batch_stats,
                          "step": state.step,
                          "opt_state": state.opt_state},
            )
            state = eov_train.TrainState(
                step=restored["step"], params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
            )
            start_epoch = int(os.path.basename(last).split("_")[1]) + 1
            print(f"resumed from {last} (epoch {start_epoch})")
    step_fn = eov_train.make_train_step(cfg, mesh)
    # Resume best-so-far tracking alongside the checkpoint resume above.
    best = None  # (val_acc, ci95, epoch)
    best_path = os.path.join(args.out, "best.json") if args.out else None
    if best_path and os.path.exists(best_path):
        with open(best_path) as f:
            doc = json.load(f)
        best = (doc["val_acc"], doc["ci95"], doc["epoch"])
    for epoch in range(start_epoch, args.epochs):
        state, m = eov_train.train_epoch(
            state, step_fn, cfg, dataset, epoch=epoch, mesh=mesh
        )
        metrics.write("epoch", epoch=epoch, **m)
        print(f"epoch {epoch}: {m}")
        if args.out:
            save_pytree(
                os.path.join(args.out, f"step_{epoch}"),
                {"params": state.params, "batch_stats": state.batch_stats,
                 "step": state.step, "opt_state": state.opt_state},
            )
        if val_dataset is not None:
            res = eov_train.one_shot_validate(
                state, cfg, val_dataset,
                n_way=args.val_n_way or 5,
                n_episodes=args.val_episodes or 120,
                num_segments=args.val_segments or 8,
                seed=cfg.seed,
            )
            metrics.write(
                "val", epoch=epoch, val_acc=res.mean_acc, ci95=res.ci95,
                n_episodes=args.val_episodes or 120,
            )
            print(f"epoch {epoch} meta-val one-shot {res}")
            if best is None or res.mean_acc > best[0]:
                best = (res.mean_acc, res.ci95, epoch)
                if best_path:
                    tmp = best_path + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump({"epoch": epoch,
                                   "val_acc": res.mean_acc,
                                   "ci95": res.ci95,
                                   "dir": f"step_{epoch}"}, f)
                    os.replace(tmp, best_path)  # atomic (pod-safe)
    if args.out:
        print(f"saved checkpoints under: {args.out}")
        if best is not None:
            print(
                f"best meta-val epoch {best[2]}: "
                f"{best[0] * 100:.2f}% +/- {best[1] * 100:.2f}% "
                f"(best.json; use --select best on test/extract)"
            )
    return 0


def cmd_test(args) -> int:
    """Video-level classification accuracy of a finetuned checkpoint."""
    _setup_platform(args)
    import jax

    from eov_tpu import train as eov_train
    from eov_tpu.utils.checkpoint import load_pytree
    from eov_tpu.utils.metrics import MetricsWriter

    dataset = _load_dataset(args)
    cfg = eov_train.TrainConfig(
        num_classes=len(dataset.class_names),
        arch=args.arch or "resnet50",
        num_segments=args.num_segments or 8,
        batch_clips=args.batch or 8,
        scale_size=args.scale_size or 256,
        crop_size=args.crop_size or 224,
        seed=args.seed,
    )
    state = eov_train.create_train_state(cfg, jax.random.PRNGKey(cfg.seed))
    if args.params:
        if args.params.endswith((".pth", ".pt", ".npz")):
            # A ported backbone has no finetuned fc head — scoring it with
            # a random head is garbage, and orbax would crash on the file
            # path anyway. test consumes TRAIN-run checkpoints.
            raise SystemExit(
                "eov test scores a finetuned checkpoint (orbax train-run "
                "dir, e.g. --params <run>/ --select best); to finetune "
                f"from {os.path.basename(args.params)} first, use "
                "`eov train --params`"
            )
        path = _resolve_ckpt_dir(
            args.params, getattr(args, "select", None) or "latest"
        )
        restored = load_pytree(
            path,
            template={"params": state.params,
                      "batch_stats": state.batch_stats,
                      "step": state.step,
                      "opt_state": state.opt_state},
        )
        state = eov_train.TrainState(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
    m = eov_train.evaluate_classifier(state, cfg, dataset)
    MetricsWriter(args.metrics).write("test_result", **m)
    print(json.dumps(m))
    return 0


def cmd_store_info(args) -> int:
    """Summarize a FeatureStore: clips, classes, dtype, shards, bytes.

    Ops tooling for the C6 feature cache (SURVEY.md §5 checkpoint/resume):
    pod runs produce multi-writer stores (per-process shard prefixes +
    manifests); this prints the merged view one JSON line — what resumes,
    what evals, and how big it is on disk.
    """
    from eov_tpu.data.store import FeatureStore

    if not os.path.isdir(args.store):
        # Read-only command: must not create the root (FeatureStore's
        # constructor does) or report a plausible all-zero summary for a
        # typo'd path.
        raise SystemExit(f"no feature store at {args.store}")
    print(json.dumps(FeatureStore(args.store).summary()))
    return 0


def cmd_fixtures(args) -> int:
    """Materialize a synthetic dataset as JPEG frame folders + split files."""
    import os

    import numpy as np
    from PIL import Image

    from eov_tpu.data import datasets
    from eov_tpu.data.fixtures import synthetic_clip

    ds = datasets.SyntheticVideoDataset(
        n_classes=args.synthetic_classes, clips_per_class=args.synthetic_clips,
        seed=args.seed,
    )
    split = []
    for rec in ds.records:
        c, j = ds._meta[rec.video_id]
        clip = synthetic_clip(c, j, rec.num_frames, ds.height, ds.width)
        vdir = os.path.join(args.root, rec.video_id)
        os.makedirs(vdir, exist_ok=True)
        for t in range(rec.num_frames):
            Image.fromarray(clip[t]).save(
                os.path.join(vdir, f"img_{t + 1:05d}.jpg"), quality=90
            )
        split.append([rec.video_id, rec.num_frames, rec.label])
    datasets.save_split_json(
        os.path.join(args.root, "split.json"), ds.class_names, {"all": split}
    )
    print(f"wrote {len(split)} videos under {args.root}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def cmd_presets(args) -> int:
    from eov_tpu.config import PRESETS, resolved_dict

    for p in PRESETS.values():
        print(f"{p.name:20s} {p.description}")
        if getattr(args, "verbose", False):
            print(json.dumps({"eval": resolved_dict(p.eval),
                              "extract": resolved_dict(p.extract)}, indent=1))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("eov", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **extra):
        p = sub.add_parser(name)
        _add_common(p)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--dataset", default="synthetic",
                       choices=["synthetic", "framedir", "videodir", "eovc"])
        p.add_argument("--root", default=None)
        p.add_argument("--split", default=None)
        p.add_argument("--split-name", default="all")
        p.add_argument("--class-split", default=None, dest="class_split",
                       help="class-split json[:part] (eov_tpu/splits/, C11)")
        p.add_argument("--jpeg-scale-denom", type=int, default=1,
                       dest="jpeg_scale_denom", choices=[1, 2, 4, 8],
                       help="eovc jpeg shards: DCT-scaled decode at "
                            "1/denom of storage resolution (native "
                            "loader; cuts decode cost ~denom^2 when "
                            "storage res > scale-size)")
        p.add_argument("--synthetic-classes", type=int, default=10)
        p.add_argument("--synthetic-clips", type=int, default=8)
        p.add_argument("--synthetic-virtual", action="store_true",
                       dest="synthetic_virtual",
                       help="virtual-agent rendering (UnrealAction analog)")
        p.add_argument("--params", default=None,
                       help="orbax dir, torch .pth, or .npz state_dict")
        p.add_argument("--arch", default=None,
                       help="backbone arch (resnet18/34/50/101/152)")
        for flag, kw in extra.items():
            p.add_argument(flag, **kw)
        p.set_defaults(fn=fn)
        return p

    add("extract", cmd_extract,
        **{"--store": {"required": True},
           "--num-segments": {
               "type": int, "dest": "num_segments", "default": None,
               "help": "TSN segments per clip K (default: the preset's, "
                       "usually 8 — the reference's num_segments flag)",
           },
           "--batch": {
               "type": int, "default": None,
               "help": "clips per device batch (default: the preset's)",
           },
           "--select": {
               "choices": ("latest", "best"), "default": "latest",
               "help": "when --params is a train-run dir: newest epoch "
                       "checkpoint, or best.json's meta-val winner",
           },
           "--store-dtype": {
               "dest": "store_dtype", "default": None,
               "choices": ("float32", "float16"),
               "help": "on-disk feature dtype (default float32; float16 "
                       "halves shard bytes — readers upcast to f32, "
                       "rounding ≪ the 0.5%% accuracy budget)",
           },
           "--multichip": {"action": "store_true"},
           "--fused-stages": {
               "dest": "fused_stages", "default": None, "metavar": "SPEC",
               "type": _fused_stages_spec,
               "help": "Pallas fused bottleneck stages: 'auto' (default), "
                       "'none', or comma list e.g. '1' / '1,2'",
           },
           "--fused-group": {
               "type": _positive_int, "dest": "fused_group", "default": None,
               "help": "images per fused-kernel grid step at the FIRST "
                       "fused stage (default 2, the measured optimum); "
                       "later fused stages scale it by their map-size "
                       "ratio (e.g. stage 2 runs at 4x) to keep matmul "
                       "rows constant; non-divisible batches run "
                       "ungrouped with a warning",
           },
           "--pallas-pool": {
               "dest": "pallas_pool", "default": None,
               "choices": ("off", "on", "fused"),
               "help": "stem maxpool implementation: 'off' = XLA "
                       "reduce_window (default), 'on' = standalone Pallas "
                       "kernel (measured negative, BASELINE.md r3), "
                       "'fused' = pooled inside the fused stage-1 stack "
                       "entry (requires stage 1 fused)",
           },
           "--quant": {
               "dest": "quant", "default": None,
               "choices": ("off", "int8"),
               "help": "post-training quantized backbone: 'off' = bf16 "
                       "production path (default), 'int8' = int8 MXU convs "
                       "(models/quant_infer.py; accuracy bound per-store "
                       "with eval --per-episode-out + tools/compare_eval)",
           },
           "--quant-calib": {
               "dest": "quant_calib", "default": None,
               "choices": ("synthetic", "dataset"),
               "help": "int8 activation-scale calibration source: "
                       "'synthetic' (deterministic fixtures, default) or "
                       "'dataset' (this extraction's first clips — "
                       "real-frame deployment calibration). The scales are "
                       "recorded in the store manifest either way; "
                       "classify reuses them",
           }})
    add(
        "eval", cmd_eval,
        **{
            "--store": {"required": True},
            "--virtual-store": {"default": None},
            "--embodied": {"action": "store_true"},
            "--n-way": {"type": int, "dest": "n_way"},
            "--k-shot": {"type": int, "dest": "k_shot"},
            "--n-query": {"type": int, "dest": "n_query"},
            "--n-episodes": {"type": int, "dest": "n_episodes"},
            "--metric": {"choices": ["cosine", "euclidean"]},
            "--fusion": {"choices": ["max", "mean"]},
            "--matcher": {"choices": ["auto", "xla", "pallas"]},
            "--multichip": {"action": "store_true"},
            "--per-episode-out": {
                "dest": "per_episode_out", "default": None, "metavar": "FILE",
                "help": "dump per-episode accuracies + protocol as JSON "
                        "for paired comparisons (tools/compare_eval.py): "
                        "same store+seed+protocol scores the identical "
                        "episode sequence (canonical ordinal sampling)",
            },
        },
    )
    add(
        "classify", cmd_classify,
        **{
            "--store": {"required": True,
                        "help": "support feature store (one-shot examples)"},
            "--num-segments": {
                "type": int, "dest": "num_segments", "default": None,
                "help": "TSN segments per query clip (must match how the "
                        "support store was extracted; default: the "
                        "preset's)",
            },
            "--batch": {
                "type": int, "default": None,
                "help": "query clips per device batch",
            },
            "--quant": {
                "dest": "quant", "default": None,
                "choices": ("off", "int8"),
                "help": "query featurization precision — must match how "
                        "the SUPPORT store was extracted (see extract "
                        "--quant)",
            },
            "--select": {
                "choices": ("latest", "best"), "default": "latest",
                "help": "when --params is a train-run dir: newest epoch "
                        "checkpoint, or best.json's meta-val winner",
            },
            "--virtual-store": {"default": None},
            "--embodied": {"action": "store_true"},
            "--metric": {"choices": ["cosine", "euclidean"]},
            "--fusion": {"choices": ["max", "mean"]},
            "--out": {"default": None, "metavar": "FILE",
                      "help": "write per-clip JSON lines here instead of "
                              "stdout"},
        },
    )
    add("episode", cmd_episode, **{"--n-way": {"type": int, "dest": "n_way"}})
    add(
        "train", cmd_train,
        **{
            "--epochs": {"type": int, "default": 1},
            "--batch": {"type": int},
            "--lr": {"type": float},
            "--num-segments": {"type": int, "dest": "num_segments"},
            "--scale-size": {"type": int, "dest": "scale_size"},
            "--crop-size": {"type": int, "dest": "crop_size"},
            "--out": {"default": None},
            "--multichip": {"action": "store_true"},
            "--val-class-split": {
                "dest": "val_class_split", "default": None,
                "metavar": "JSON[:part]",
                "help": "meta-val class split (default part 'val'): score "
                        "each epoch by one-shot episodic accuracy on these "
                        "held-out classes and record the best checkpoint "
                        "in best.json (reference model-selection rule)",
            },
            "--val-episodes": {
                "type": int, "dest": "val_episodes", "default": None,
                "help": "episodes per meta-val pass (default 120)",
            },
            "--val-n-way": {
                "type": int, "dest": "val_n_way", "default": None,
                "help": "n-way of the meta-val episodes (default 5)",
            },
            "--val-segments": {
                "type": int, "dest": "val_segments", "default": None,
                "help": "eval-time TSN K for the meta-val features "
                        "(default 8 — the eval protocol's K, independent "
                        "of the train-time --num-segments)",
            },
        },
    )
    add(
        "test", cmd_test,
        **{
            "--batch": {"type": int},
            "--num-segments": {"type": int, "dest": "num_segments"},
            "--scale-size": {"type": int, "dest": "scale_size"},
            "--crop-size": {"type": int, "dest": "crop_size"},
            "--select": {
                "choices": ("latest", "best"), "default": "latest",
                "help": "which checkpoint to take from a train-run dir: "
                        "newest epoch, or best.json's meta-val winner",
            },
        },
    )
    add("store-info", cmd_store_info, **{"--store": {"required": True}})
    add("fixtures", cmd_fixtures)
    add("bench", cmd_bench)
    pp = sub.add_parser("presets", help="list config presets")
    pp.add_argument("--verbose", action="store_true")
    pp.set_defaults(fn=cmd_presets)

    args = ap.parse_args(argv)
    if getattr(args, "trace", None):
        import contextlib

        import jax

        with contextlib.ExitStack() as stack:
            stack.enter_context(jax.profiler.trace(args.trace))
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
