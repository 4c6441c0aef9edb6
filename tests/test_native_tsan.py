"""ThreadSanitizer stress of the native loader's pool (SURVEY.md §5 races).

The loader is the build's only first-party concurrency in C++ (pthread
pool + condvar completions + the async batch ring). The suite's
deterministic-mode test proves sync == async RESULTS; this test proves the
synchronization itself: a TSAN rebuild, 4 Python threads hammering pooled
loads concurrently plus the submit/wait ring, asserting zero
ThreadSanitizer reports that implicate clip_loader.cc. Skips when the gcc
TSAN runtime is absent.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_REPO, "native")

_CHILD = r"""
import os, sys, threading
import numpy as np

sys.path.insert(0, sys.argv[2])
from eov_tpu.runtime import native

assert native.native_available(), "tsan build did not load"
ld = native.NativeClipLoader(sys.argv[1], n_threads=4)
errs = []

def hammer(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        cl = [int(rng.integers(0, ld.n_clips)) for _ in range(3)]
        idx = rng.integers(0, 8, size=(3, 4)).astype(np.int32)
        try:
            out = ld.load_batch(cl, idx)
            assert out.shape == (3, 4, ld.height, ld.width, 3)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

ts = [threading.Thread(target=hammer, args=(s,)) for s in range(4)]
[t.start() for t in ts]
[t.join() for t in ts]
for _ in range(20):  # async ring after the concurrent phase
    ld.submit([0, 1], np.zeros((2, 4), np.int32))
    ld.wait()
assert not errs, errs[:2]
print("TSAN_STRESS_OK")
"""


def test_native_pool_tsan_stress(tmp_path):
    probe = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"], capture_output=True,
        text=True,
    )
    libtsan = probe.stdout.strip()
    if probe.returncode != 0 or not os.path.isabs(libtsan) \
            or not os.path.exists(libtsan):
        pytest.skip("gcc ThreadSanitizer runtime not available")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=thread", "-fPIC", "-std=c++17",
         "-Wall", "-Wextra", "-pthread", "clip_loader.cc",
         "-o", "libeovc_tsan.so", "-shared", "-ljpeg", "-lpthread"],
        cwd=_NATIVE, capture_output=True, text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build failed: {build.stderr[-500:]}")

    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.tools.pack_eovc import pack

    ds = SyntheticVideoDataset(n_classes=4, clips_per_class=4, seed=0,
                               height=40, width=48)
    shard = str(tmp_path / "s.eovc")
    pack(ds, shard, storage_short_side=36, codec="jpeg")

    child = str(tmp_path / "child.py")
    with open(child, "w") as f:
        f.write(_CHILD)
    env = dict(
        os.environ,
        LD_PRELOAD=libtsan,
        EOV_NATIVE_LIB=os.path.join(_NATIVE, "libeovc_tsan.so"),
        TSAN_OPTIONS="report_thread_leaks=0 halt_on_error=0",
    )
    r = subprocess.run(
        [sys.executable, child, shard, _REPO],
        capture_output=True, text=True, env=env, timeout=300,
    )
    out = r.stdout + r.stderr
    # Uninstrumented CPython/numpy could in principle produce unrelated
    # noise; what must be clean is OUR code — any report implicating
    # clip_loader.cc fails, as does a nonzero exit or a missing OK marker.
    implicated = [ln for ln in out.splitlines() if "clip_loader" in ln]
    assert not implicated, out[-4000:]
    assert r.returncode == 0, out[-4000:]
    assert "TSAN_STRESS_OK" in r.stdout
