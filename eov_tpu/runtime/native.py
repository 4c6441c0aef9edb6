"""ctypes binding to the native EOVC clip loader (native/clip_loader.cc).

Builds libeovc.so on first use if the toolchain is available (g++ -ljpeg);
falls back to the pure-python reader otherwise. The native path releases the
GIL for the whole mmap+decode (ctypes calls drop the GIL), so a single
python process overlaps multi-threaded decode with TPU compute —
the double-buffering contract from SURVEY.md §3.1 / BASELINE.json:5.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

__all__ = ["native_available", "NativeClipLoader", "build_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libeovc.so"))

_lib = None


def build_native(force: bool = False) -> str | None:
    """Build libeovc.so via make; returns the path or None on failure."""
    if os.path.exists(_SO_PATH) and not force:
        return _SO_PATH
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR), "libeovc.so"],
            check=True, capture_output=True,
        )
        return _SO_PATH if os.path.exists(_SO_PATH) else None
    except Exception:
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    # EOV_NATIVE_LIB overrides the library path (instrumented builds:
    # tests/test_native_asan.py points this at libeovc_asan.so under an
    # LD_PRELOADed AddressSanitizer runtime).
    path = os.environ.get("EOV_NATIVE_LIB") or build_native()
    if path is None or not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.eovc_open.restype = ctypes.c_void_p
    lib.eovc_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    if hasattr(lib, "eovc_open_scaled"):  # older .so via EOV_NATIVE_LIB
        lib.eovc_open_scaled.restype = ctypes.c_void_p
        lib.eovc_open_scaled.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int32,
        ]
    lib.eovc_close.argtypes = [ctypes.c_void_p]
    lib.eovc_n_clips.restype = ctypes.c_int64
    lib.eovc_n_clips.argtypes = [ctypes.c_void_p]
    for f in ("eovc_height", "eovc_width", "eovc_codec"):
        getattr(lib, f).restype = ctypes.c_int32
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.eovc_clip_info.restype = ctypes.c_int32
    lib.eovc_clip_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.eovc_load_batch.restype = ctypes.c_int32
    lib.eovc_load_batch.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, i32p, ctypes.c_int32, u8p,
    ]
    lib.eovc_submit.restype = ctypes.c_int32
    lib.eovc_submit.argtypes = lib.eovc_load_batch.argtypes
    lib.eovc_wait.restype = ctypes.c_int32
    lib.eovc_wait.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeClipLoader:
    """Threaded mmap+decode loader over an EOVC file.

    load_batch: synchronous pooled decode.
    submit/wait: async FIFO — submit batch i+1 before waiting on i to
    double-buffer against device compute.
    """

    def __init__(self, path: str, n_threads: int | None = None,
                 scale_denom: int = 1):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        if n_threads is None:
            n_threads = max(1, (os.cpu_count() or 1))
        if scale_denom == 1:
            self._h = lib.eovc_open(path.encode(), n_threads)
        elif hasattr(lib, "eovc_open_scaled"):
            # DCT-domain scaled jpeg decode (VERDICT r3 #3): frames come
            # back at 1/scale_denom of storage resolution; height/width
            # below report the SCALED dims so callers size buffers right.
            self._h = lib.eovc_open_scaled(
                path.encode(), n_threads, int(scale_denom)
            )
        else:
            raise RuntimeError(
                "this libeovc.so predates eovc_open_scaled; rebuild "
                "(make -C native) or drop scale_denom"
            )
        if not self._h:
            raise IOError(
                f"eovc_open failed: {path}"
                + (f" (scale_denom={scale_denom}: jpeg-codec shards only, "
                   "denom in 1/2/4/8)" if scale_denom != 1 else "")
            )
        self.n_clips = int(lib.eovc_n_clips(self._h))
        self.height = int(lib.eovc_height(self._h))
        self.width = int(lib.eovc_width(self._h))
        self.codec = int(lib.eovc_codec(self._h))
        # Keep submitted buffers alive until their wait() completes.
        self._inflight: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def clip_info(self, idx: int) -> tuple[str, int, int]:
        vid = ctypes.create_string_buffer(64)
        label = ctypes.c_int32()
        nf = ctypes.c_int32()
        rc = self._lib.eovc_clip_info(
            self._h, idx, vid, ctypes.byref(label), ctypes.byref(nf)
        )
        if rc != 0:
            raise IndexError(idx)
        return vid.value.decode(), int(label.value), int(nf.value)

    def load_batch(
        self,
        clip_indices: Sequence[int],
        frame_indices: np.ndarray,
        out: np.ndarray | None = None,
    ) -> np.ndarray:
        """Pooled decode; ``out`` reuses a caller buffer (shape/dtype
        checked). Buffer reuse matters: on this dev VM first-touch faults
        on fresh >32 MB numpy buffers run at ~35 MB/s (measured r3 — glibc
        munmaps big frees, so fresh allocs never reuse faulted pages), and
        production pipelines want pinned-buffer rings anyway."""
        clips = np.ascontiguousarray(clip_indices, np.int32)
        frames = np.ascontiguousarray(frame_indices, np.int32)
        b, k = frames.shape
        assert len(clips) == b
        shape = (b, k, self.height, self.width, 3)
        if out is None:
            out = np.empty(shape, np.uint8)
        elif (out.shape != shape or out.dtype != np.uint8
              or not out.flags.c_contiguous):
            raise ValueError(
                f"out buffer mismatch: want C-contiguous u8 {shape}, got "
                f"{out.dtype} {out.shape}"
            )
        rc = self._lib.eovc_load_batch(self._h, clips, b, frames, k, out)
        if rc != 0:
            raise IOError(f"eovc_load_batch failed: {rc}")
        return out

    def submit(
        self, clip_indices: Sequence[int], frame_indices: np.ndarray
    ) -> np.ndarray:
        """Async decode into a fresh buffer; pair with wait() (FIFO)."""
        clips = np.ascontiguousarray(clip_indices, np.int32)
        frames = np.ascontiguousarray(frame_indices, np.int32)
        b, k = frames.shape
        out = np.empty((b, k, self.height, self.width, 3), np.uint8)
        rc = self._lib.eovc_submit(self._h, clips, b, frames, k, out)
        if rc != 0:
            raise IOError(f"eovc_submit failed: {rc}")
        self._inflight.append((clips, frames, out))
        return out

    def wait(self) -> np.ndarray:
        """Block for the oldest submitted batch; returns its buffer."""
        rc = self._lib.eovc_wait(self._h)
        if rc == -100:
            raise RuntimeError("eovc_wait: nothing in flight")
        _, _, out = self._inflight.pop(0)
        if rc != 0:
            raise IOError(f"decode failed: {rc}")
        return out

    def close(self) -> None:
        if self._h:
            self._lib.eovc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
