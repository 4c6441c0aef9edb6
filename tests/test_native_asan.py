"""AddressSanitizer fuzz of the native EOVC loader (SURVEY.md §5 safety).

The in-suite byte-flip fuzz (test_runtime.py) detects crashes; this test
rebuilds the loader with ASAN and re-runs a compact fuzz + a clean
round-trip in a subprocess with the sanitizer runtime LD_PRELOADed —
catching the failure mode crash-fuzzing cannot see: a silently successful
out-of-bounds READ of mapped-but-wrong bytes (the loader parses untrusted
index offsets into an mmap). Skips when the gcc ASAN runtime is absent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE = os.path.join(_REPO, "native")

_CHILD = r"""
import os, sys
import numpy as np

sys.path.insert(0, sys.argv[3])
from eov_tpu.runtime import native

assert native.native_available(), "asan build did not load"
path = sys.argv[1]
out_dir = sys.argv[2]

# Clean round-trip first: the instrumented build must behave identically.
ld = native.NativeClipLoader(path, n_threads=2)
assert ld.n_clips == 4
vid, label, nf = ld.clip_info(0)
batch = ld.load_batch([0, 1], np.zeros((2, 3), np.int32))
assert batch.shape[0] == 2 and batch.dtype == np.uint8

jpath = sys.argv[4]
# Clean scaled round-trip on the jpeg shard (the r4 DCT-scaled path:
# scaled dims drive the output buffer sizing).
ldj = native.NativeClipLoader(jpath, n_threads=2, scale_denom=2)
bj = ldj.load_batch([0, 1], np.zeros((2, 3), np.int32))
assert bj.shape[0] == 2 and bj.dtype == np.uint8

opened = 0
rng = np.random.default_rng(0)
# Fuzz all three untrusted-input decode configs: raw, jpeg full-size, and
# jpeg DCT-scaled (denom 2 — mutated payloads carry arbitrary header dims,
# and the scaled path's ceil-rule buffer sizing must refuse, not overflow).
for src, denom, trials in ((path, 1, 150), (jpath, 1, 100), (jpath, 2, 100)):
    data = bytearray(open(src, "rb").read())
    for trial in range(trials):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            if rng.integers(2):
                pos = int(rng.integers(0, 40))
            else:
                pos = int(rng.integers(0, len(mut)))
            mut[pos] ^= int(rng.integers(1, 256))
        p = os.path.join(out_dir, "m.eovc")
        open(p, "wb").write(mut)
        try:
            ld = native.NativeClipLoader(p, n_threads=1, scale_denom=denom)
            opened += 1
            for ci in range(min(ld.n_clips, 4)):
                _, _, nf = ld.clip_info(ci)
                if 0 < nf <= 64:
                    ld.load_batch([ci], np.zeros((1, 2), np.int32))
        except Exception:
            pass
assert opened > 0
print("ASAN_FUZZ_OK", opened)
"""


def test_native_loader_asan_fuzz(tmp_path):
    probe = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True,
        text=True,
    )
    libasan = probe.stdout.strip()
    if probe.returncode != 0 or not os.path.isabs(libasan) \
            or not os.path.exists(libasan):
        pytest.skip("gcc AddressSanitizer runtime not available")
    build = subprocess.run(
        ["make", "-C", _NATIVE, "libeovc_asan.so"], capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"asan build failed: {build.stderr[-500:]}")

    # Pack the fixture shard in THIS process (jax-heavy imports stay out of
    # the sanitized child, which only needs numpy + ctypes).
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.tools.pack_eovc import pack

    ds = SyntheticVideoDataset(n_classes=2, clips_per_class=2, seed=0,
                               height=40, width=48)
    shard = str(tmp_path / "a.eovc")
    pack(ds, shard, storage_short_side=36, codec="raw")
    jshard = str(tmp_path / "j.eovc")
    pack(ds, jshard, storage_short_side=36, codec="jpeg")

    child = str(tmp_path / "child.py")
    with open(child, "w") as f:
        f.write(_CHILD)
    env = dict(
        os.environ,
        LD_PRELOAD=libasan,
        EOV_NATIVE_LIB=os.path.join(_NATIVE, "libeovc_asan.so"),
        # Python itself "leaks" at exit; leak checking would false-positive.
        ASAN_OPTIONS="detect_leaks=0",
    )
    r = subprocess.run(
        [sys.executable, child, shard, str(tmp_path), _REPO, jshard],
        capture_output=True, text=True, env=env, timeout=300,
    )
    out = r.stdout + r.stderr
    assert "AddressSanitizer" not in out, out[-4000:]
    assert r.returncode == 0, out[-4000:]
    assert "ASAN_FUZZ_OK" in r.stdout
