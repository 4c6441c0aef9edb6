"""Worker process for the 2-process DCN integration test (test_multihost.py).

Runs one member of a real multi-controller jax job on CPU (gloo collectives)
and performs a sharded pod-style extraction into a shared store root —
exactly the cmd_extract --multichip code path, minus argparse.

Usage: python multihost_worker.py PID NPROCS PORT STORE_ROOT OUT_DIR \
           [N_CLASSES,CLIPS_PER_CLASS]
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    store_root, out_dir = sys.argv[4], sys.argv[5]
    n_classes, clips_per_class = (
        (int(v) for v in sys.argv[6].split(",")) if len(sys.argv) > 6
        else (4, 4)
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from eov_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 2 * nprocs

    import jax.numpy as jnp

    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.data.store import FeatureStore
    from eov_tpu.extract import ExtractConfig, extract_features
    from eov_tpu.models import ResNet50
    from eov_tpu.parallel.sharded import make_sharded_feature_fn

    # Identical on every host: same seed, same shapes.
    ds = SyntheticVideoDataset(n_classes=n_classes,
                               clips_per_class=clips_per_class, seed=7,
                               height=40, width=48)
    params = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )

    mesh = dist.global_mesh(n_frame=2)  # data=2 (one row per host), frame=2
    fn = make_sharded_feature_fn(
        params, mesh, scale_size=36, crop_size=32, compute_dtype=jnp.float32
    )
    cfg = ExtractConfig(
        num_segments=4, batch_clips=4, scale_size=36, crop_size=32,
        compute_dtype="float32", deterministic=True, pad_batches=True,
        flush_every=3,  # force several shards per writer
    )
    records = dist.process_record_shard(ds.records)
    store = FeatureStore(store_root, class_names=list(ds.class_names))
    assert store.process_index == pid
    stats = extract_features(
        ds, params, store, cfg, feature_fn=fn, records=records, mesh=mesh
    )

    dist.barrier("done_extract")
    # Every host sees the union through the merged manifests.
    n_done = len(store.done_ids())

    # Cross-process episodic eval over the merged table: the [E] accuracy
    # all_gather rides the DCN-analog (gloo) collectives here.
    from eov_tpu.eval import EvalConfig
    from eov_tpu.parallel.sharded import evaluate_sharded

    res = evaluate_sharded(
        store.to_table(),
        EvalConfig(n_way=min(4, n_classes), n_episodes=24,
                   episodes_per_step=8, seed=3),
        mesh,
    )

    # Pod TRAIN step (C12 x §2c, balanced case only): pjit DP over the
    # 2-host global mesh with per-host input rows lifted to global arrays
    # — the gradient + BN-stat reductions ride the gloo (DCN-analog)
    # collectives, and the replicated state must stay bit-identical
    # across processes.
    train_report = None
    if len(sys.argv) <= 6:
        import numpy as np

        from eov_tpu import train as tr

        cfg_t = tr.TrainConfig(
            num_classes=n_classes, arch="resnet18", num_segments=2,
            batch_clips=4, scale_size=36, crop_size=32,
            compute_dtype="float32", dropout=0.0,
        )
        state = tr.create_train_state(
            cfg_t, jax.random.PRNGKey(1), sample_hw=(32, 32)
        )
        # np leaves = replicated-by-value inputs in multi-controller jit
        # (same convention as make_sharded_feature_fn's params).
        state = jax.tree.map(np.asarray, state)
        mesh_t = dist.global_mesh(n_frame=1)  # data axis = all 4 devices
        step = tr.make_train_step(cfg_t, mesh_t, donate=False)
        mine = records[:2]  # this host's rows of the global batch of 4
        frames_local = np.stack(
            [ds.get_frames(r, np.array([0, 1])) for r in mine]
        )
        labels_local = np.array([r.label for r in mine], np.int32)
        losses = []
        for s in range(2):
            gb = dist.host_batch_to_global(mesh_t, frames_local)
            gl = dist.host_batch_to_global(mesh_t, labels_local)
            state, m = step(
                state, gb, gl, np.asarray(jax.random.PRNGKey(100 + s))
            )
            losses.append(float(m["loss"]))
        checksum = float(
            sum(np.abs(np.asarray(l)).sum(dtype=np.float64)
                for l in jax.tree.leaves(state.params))
        )
        train_report = {"losses": losses, "params_checksum": checksum}

        # Pod EPOCH through the production host loop (the exact
        # cmd_train --multichip path), with a wrap-padded tail: 14 of the
        # 16 records -> 3 full global batches + a padded fourth. Batch
        # composition is host-invariant, so the parent can reproduce it
        # single-process bit-for-bit at the input level.
        class Sub:
            records = ds.records[:14]
            class_names = ds.class_names
            get_frames = ds.get_frames

        state_e = tr.create_train_state(
            cfg_t, jax.random.PRNGKey(2), sample_hw=(32, 32)
        )
        state_e, em = tr.train_epoch(
            state_e, step, cfg_t, Sub(), epoch=0, mesh=mesh_t
        )
        checksum_e = float(
            sum(np.abs(np.asarray(l)).sum(dtype=np.float64)
                for l in jax.tree.leaves(state_e.params))
        )
        train_report["epoch"] = {
            "metrics": {k: float(v) for k, v in em.items()},
            "params_checksum": checksum_e,
        }

    with open(os.path.join(out_dir, f"worker{pid}.json"), "w") as f:
        json.dump({"stats": stats, "n_done": n_done,
                   "local_records": len(records),
                   "eval_mean_acc": res.mean_acc,
                   "train": train_report}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
