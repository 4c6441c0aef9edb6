"""Real multi-host (DCN) integration: two local jax processes, one store.

VERDICT r1 top item: the multi-host path must actually execute, not just be
wired. These tests run a genuine 2-process multi-controller jax job on CPU
(gloo cross-process collectives), drive the sharded pod extraction loop end
to end into ONE shared store root, and require the merged features to match
the single-process pipeline exactly (SURVEY.md §2c comm row,
BASELINE.json config 5).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eov_tpu.data.store import FeatureStore

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_store_multi_writer_namespaces(tmp_path):
    """Two writers on one root never collide: private shard names + private
    manifests, merged reads (VERDICT r1 weak #3)."""
    root = str(tmp_path / "mw")
    s0 = FeatureStore(root, class_names=["a", "b"], process_index=0)
    s1 = FeatureStore(root, class_names=["a", "b"], process_index=1)
    s0.put("v0", np.ones(4, np.float32), 0)
    s1.put("v1", 2 * np.ones(4, np.float32), 1)
    n0, n1 = s0.flush(), s1.flush()
    assert n0 != n1 and n0.startswith("shard_p000_") and \
        n1.startswith("shard_p001_")

    # Either handle (and a fresh reader) sees the union.
    assert s0.done_ids() == s1.done_ids() == {"v0", "v1"}
    fresh = FeatureStore(root, process_index=0)
    data = fresh.load_all()
    assert set(data) == {"v0", "v1"}
    np.testing.assert_array_equal(data["v1"][0], 2 * np.ones(4, np.float32))
    assert data["v1"][1] == 1
    assert fresh.class_names == ["a", "b"]

    # Second flush of the same writer gets a fresh index, even after reopen.
    s1b = FeatureStore(root, process_index=1)
    s1b.put("v2", np.zeros(4, np.float32), 0)
    assert s1b.flush() == "shard_p001_00001.npz"

    # Writers disagreeing on class names is an error.
    with pytest.raises(ValueError, match="class_names"):
        FeatureStore(root, class_names=["x"], process_index=2)


def test_cluster_env_detection(monkeypatch):
    from eov_tpu.parallel import distributed as dist

    for v in ("EOV_MULTIHOST", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
              "SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(v, raising=False)
    assert not dist._cluster_env_detected()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")  # single worker
    assert not dist._cluster_env_detected()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert dist._cluster_env_detected()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "1")
    assert not dist._cluster_env_detected()
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "4")
    assert dist._cluster_env_detected()
    monkeypatch.delenv("SLURM_JOB_NUM_NODES")
    monkeypatch.setenv("EOV_MULTIHOST", "1")
    assert dist._cluster_env_detected()


def test_two_process_extraction_matches_single_process(tmp_path):
    """Launch 2 real multi-controller processes sharing one store root; the
    merged features must equal the single-process pipeline's exactly."""
    store_root = str(tmp_path / "podstore")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port),
             store_root, out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    reports = []
    for pid in range(2):
        with open(os.path.join(out_dir, f"worker{pid}.json")) as f:
            reports.append(json.load(f))
    # 16 clips strided over 2 hosts; every host saw the union at the end.
    assert [r["local_records"] for r in reports] == [8, 8]
    assert all(r["stats"]["extracted"] == 8 for r in reports)
    assert all(r["stats"]["failed"] == 0 for r in reports)
    assert all(r["n_done"] == 16 for r in reports)

    # Single-process reference (same dataset, params, preprocess chain).
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.extract import ExtractConfig, extract_features

    ds = SyntheticVideoDataset(n_classes=4, clips_per_class=4, seed=7,
                               height=40, width=48)
    from eov_tpu.models import ResNet50

    params = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    ref_store = FeatureStore(str(tmp_path / "ref"),
                             class_names=list(ds.class_names),
                             process_index=0)
    extract_features(
        ds, params, ref_store,
        ExtractConfig(num_segments=4, batch_clips=4, scale_size=36,
                      crop_size=32, compute_dtype="float32",
                      deterministic=True),
    )

    pod = FeatureStore(store_root, process_index=0).load_all()
    ref = ref_store.load_all()
    assert set(pod) == set(ref)
    for vid in ref:
        assert pod[vid][1] == ref[vid][1]
        np.testing.assert_allclose(
            pod[vid][0], ref[vid][0], rtol=1e-4, atol=1e-5, err_msg=vid
        )

    # And the eval protocol over the merged pod store matches the reference
    # store bit-for-bit (same seeded episodes, same features).
    from eov_tpu.eval import EvalConfig, evaluate

    cfg = EvalConfig(n_way=4, n_episodes=32, episodes_per_step=16)
    r_pod = evaluate(FeatureStore(store_root, process_index=0).to_table(), cfg)
    r_ref = evaluate(ref_store.to_table(), cfg)
    assert r_pod.mean_acc == r_ref.mean_acc

    # The workers also ran the sharded eval protocol ACROSS the two
    # processes; both must agree with each other and with this parent's
    # single-process run of the identical mesh protocol (data=2, frame=2).
    assert reports[0]["eval_mean_acc"] == reports[1]["eval_mean_acc"]
    from eov_tpu.eval import EvalConfig as EC
    from eov_tpu.parallel.mesh import make_mesh
    from eov_tpu.parallel.sharded import evaluate_sharded

    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    r_local = evaluate_sharded(
        FeatureStore(store_root, process_index=0).to_table(),
        EC(n_way=4, n_episodes=24, episodes_per_step=8, seed=3),
        mesh,
    )
    assert r_local.mean_acc == reports[0]["eval_mean_acc"]

    # The workers also EXECUTED a pod train step (pjit DP, per-host rows
    # lifted to global arrays, gradient/BN psums over gloo): both processes
    # must observe identical losses and bit-identical post-step params,
    # and the result must match this parent's single-process run of the
    # same two global steps (same global batch, same keys).
    t0, t1 = reports[0]["train"], reports[1]["train"]
    assert t0 is not None and t1 is not None
    assert t0["losses"] == t1["losses"]
    assert t0["params_checksum"] == t1["params_checksum"]

    from eov_tpu import train as tr

    cfg_t = tr.TrainConfig(
        num_classes=4, arch="resnet18", num_segments=2, batch_clips=4,
        scale_size=36, crop_size=32, compute_dtype="float32", dropout=0.0,
    )
    state = tr.create_train_state(cfg_t, jax.random.PRNGKey(1),
                                  sample_hw=(32, 32))
    step = tr.make_train_step(cfg_t, mesh=None, donate=False)
    # Global batch = host0's first 2 strided records then host1's (the
    # host_batch_to_global row order).
    recs = [r for pid in range(2) for r in ds.records[pid::2][:2]]
    frames = jnp.asarray(
        np.stack([ds.get_frames(r, np.array([0, 1])) for r in recs])
    )
    labels = jnp.asarray(np.array([r.label for r in recs], np.int32))
    losses = []
    for s in range(2):
        state, m = step(state, frames, labels, jax.random.PRNGKey(100 + s))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, t0["losses"], rtol=1e-5)
    checksum = float(
        sum(np.abs(np.asarray(l)).sum(dtype=np.float64)
            for l in jax.tree.leaves(state.params))
    )
    np.testing.assert_allclose(checksum, t0["params_checksum"], rtol=1e-6)

    # The pod EPOCH (the cmd_train --multichip host loop, wrap-padded
    # tail included) agrees across processes and with a single-process
    # epoch of the same config — same global permutation, same TSN index
    # stream, same batch composition.
    e0, e1 = t0["epoch"], t1["epoch"]
    assert e0["metrics"] == e1["metrics"]
    assert e0["params_checksum"] == e1["params_checksum"]
    assert e0["metrics"]["steps"] == 4.0 and e0["metrics"]["clips"] == 14.0

    class Sub:
        records = ds.records[:14]
        class_names = ds.class_names
        get_frames = ds.get_frames

    state_e = tr.create_train_state(cfg_t, jax.random.PRNGKey(2),
                                    sample_hw=(32, 32))
    state_e, em = tr.train_epoch(state_e, step, cfg_t, Sub(),
                                           epoch=0)
    assert em["steps"] == 4 and em["clips"] == 14
    np.testing.assert_allclose(em["loss"], e0["metrics"]["loss"], rtol=1e-5)
    checksum_e = float(
        sum(np.abs(np.asarray(l)).sum(dtype=np.float64)
            for l in jax.tree.leaves(state_e.params))
    )
    np.testing.assert_allclose(checksum_e, e0["params_checksum"], rtol=1e-6)


def test_two_process_unbalanced_hosts(tmp_path):
    """15 clips over 2 hosts (8 vs 7): the short host must run a padded
    dummy step (global_max step sync) instead of desyncing the collectives,
    and every real clip must land in the merged store."""
    store_root = str(tmp_path / "unbal")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port),
             store_root, out_dir, "3,5"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    reports = []
    for pid in range(2):
        with open(os.path.join(out_dir, f"worker{pid}.json")) as f:
            reports.append(json.load(f))
    assert sorted(r["local_records"] for r in reports) == [7, 8]
    assert sum(r["stats"]["extracted"] for r in reports) == 15
    assert all(r["n_done"] == 15 for r in reports)
    assert reports[0]["eval_mean_acc"] == reports[1]["eval_mean_acc"]
    data = FeatureStore(store_root, process_index=0).load_all()
    assert len(data) == 15
