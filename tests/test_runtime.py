"""EOVC container + native loader tests (SURVEY.md §2b N4, §5 race detection).

Round-trips raw and JPEG shards through the python writer, then reads via
both the pure-python reader and (when the toolchain builds it) the native
threaded loader, asserting identical bytes and async==sync results.
"""

import numpy as np
import pytest

from eov_tpu.data.datasets import EovcVideoDataset, SyntheticVideoDataset
from eov_tpu.runtime import eovc
from eov_tpu.runtime.native import NativeClipLoader, native_available
from eov_tpu.tools.pack_eovc import pack


@pytest.fixture(scope="module")
def raw_shard(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("eovc") / "raw.eovc")
    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=2, height=40,
                               width=56, min_frames=6, max_frames=10, seed=1)
    n = pack(ds, path, storage_short_side=None, codec="raw")
    assert n == 6
    return path, ds


@pytest.fixture(scope="module")
def jpeg_shard(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("eovc") / "j.eovc")
    ds = SyntheticVideoDataset(n_classes=2, clips_per_class=2, height=40,
                               width=56, min_frames=6, max_frames=8, seed=2)
    pack(ds, path, storage_short_side=None, codec="jpeg")
    return path, ds


def test_python_reader_roundtrip(raw_shard):
    path, ds = raw_shard
    r = eovc.EovcReader(path)
    assert len(r.clips) == len(ds.records)
    for i, rec in enumerate(ds.records):
        assert r.clips[i].video_id == rec.video_id
        assert r.clips[i].label == rec.label
        want = ds.get_frames(rec, np.arange(rec.num_frames))
        got = r.load_frames(i, list(range(rec.num_frames)))
        np.testing.assert_array_equal(got, want)


def test_native_loader_matches_python(raw_shard):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    path, ds = raw_shard
    nl = NativeClipLoader(path, n_threads=4)
    r = eovc.EovcReader(path)
    assert nl.n_clips == len(ds.records)
    vid, label, nf = nl.clip_info(0)
    assert vid == ds.records[0].video_id
    assert nf == ds.records[0].num_frames

    idx = np.array([[0, 2, 4], [1, 3, 5]], np.int32)
    batch = nl.load_batch([0, 1], idx)
    assert batch.shape == (2, 3, 40, 56, 3)
    for b in range(2):
        np.testing.assert_array_equal(
            batch[b], r.load_frames(b, idx[b].tolist())
        )
    nl.close()


def test_native_async_submit_wait(raw_shard):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    path, _ = raw_shard
    nl = NativeClipLoader(path, n_threads=2)
    idx0 = np.array([[0, 1, 2]], np.int32)
    idx1 = np.array([[3, 4, 5]], np.int32)
    # Double-buffered: two submits in flight, FIFO waits.
    nl.submit([0], idx0)
    nl.submit([1], idx1)
    a = nl.wait()
    b = nl.wait()
    np.testing.assert_array_equal(a, nl.load_batch([0], idx0))
    np.testing.assert_array_equal(b, nl.load_batch([1], idx1))
    with pytest.raises(RuntimeError):
        nl.wait()
    nl.close()


def test_native_jpeg_decode_close_to_source(jpeg_shard):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    path, ds = jpeg_shard
    nl = NativeClipLoader(path)
    assert nl.codec == eovc.CODEC_JPEG
    rec = ds.records[0]
    src = ds.get_frames(rec, np.arange(4))
    got = nl.load_batch([0], np.arange(4, dtype=np.int32)[None, :])[0]
    # JPEG q90 round trip: small lossy error.
    err = np.abs(got.astype(np.int16) - src.astype(np.int16)).mean()
    assert err < 8.0, err  # synthetic gratings are JPEG-hostile
    nl.close()


def test_native_out_of_range_frame_errors(raw_shard):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    path, _ = raw_shard
    nl = NativeClipLoader(path)
    with pytest.raises(IOError):
        nl.load_batch([0], np.array([[999]], np.int32))
    nl.close()


def test_eovc_dataset_protocol(raw_shard):
    path, ds = raw_shard
    eds = EovcVideoDataset(path)
    assert len(eds.records) == len(ds.records)
    rec = eds.records[2]
    idx = np.array([0, 1])
    np.testing.assert_array_equal(
        eds.get_frames(rec, idx),
        ds.get_frames(ds.records[2], idx),
    )
    # Batch path.
    batch = eds.get_batch(eds.records[:2], np.array([[0, 1], [1, 2]]))
    assert batch.shape == (2, 2, 40, 56, 3)


def test_native_rejects_truncated_shard(tmp_path):
    """Corrupt/truncated EOVC files must fail open cleanly (bounds-checked
    index parse), never read out of bounds; python reader raises too."""
    import numpy as np

    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.runtime import native
    from eov_tpu.tools.pack_eovc import pack

    ds = SyntheticVideoDataset(n_classes=2, clips_per_class=1, seed=0,
                               height=40, width=48)
    path = str(tmp_path / "t.eovc")
    pack(ds, path, storage_short_side=36, codec="raw")
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.eovc")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) - 200])  # cut into the index

    if native.native_available():
        import pytest

        with pytest.raises((RuntimeError, OSError)):
            native.NativeClipLoader(trunc)


def test_sharded_eovc_directory_dataset(tmp_path):
    """A directory of .eovc shards reads as one dataset (production layout);
    pooled get_batch spans shards and restores record order."""
    import numpy as np

    from eov_tpu.data.datasets import EovcVideoDataset, SyntheticVideoDataset
    from eov_tpu.tools.pack_eovc import pack

    a = SyntheticVideoDataset(n_classes=2, clips_per_class=2, seed=0,
                              height=40, width=48, name="sa")
    b = SyntheticVideoDataset(n_classes=2, clips_per_class=1, seed=1,
                              height=40, width=48, name="sb")
    pack(a, str(tmp_path / "00.eovc"), storage_short_side=36, codec="raw")
    pack(b, str(tmp_path / "01.eovc"), storage_short_side=36, codec="raw")

    ds = EovcVideoDataset(str(tmp_path))
    assert len(ds.records) == 6
    # Interleave records across shards; batch must come back in order.
    recs = [ds.records[i] for i in (5, 0, 4, 1)]
    idx = np.zeros((4, 3), np.int32)
    idx[:] = [0, 1, 2]
    batch = ds.get_batch(recs, idx)
    assert batch.shape[:2] == (4, 3)
    for j, r in enumerate(recs):
        single = ds.get_frames(r, idx[j])
        np.testing.assert_array_equal(batch[j], single)


def test_native_loader_survives_byte_flip_fuzz(tmp_path):
    """Seeded byte-flip fuzz over the header + index region of a valid
    shard: the native parser must either open-and-read correctly or raise
    a Python exception — never crash the process or read out of bounds
    (the C++ loader is the one first-party parser of untrusted bytes;
    SURVEY.md §5 failure containment). 60 seeded single/multi-byte
    corruptions; clips that open are also read end to end so bounds bugs
    in the frame path (not just the index parse) get exercised."""
    import numpy as np

    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.runtime import native
    from eov_tpu.tools.pack_eovc import pack

    if not native.native_available():
        import pytest

        pytest.skip("native loader unavailable")

    ds = SyntheticVideoDataset(n_classes=2, clips_per_class=2, seed=0,
                               height=40, width=48)
    path = str(tmp_path / "f.eovc")
    pack(ds, path, storage_short_side=36, codec="raw")
    data = bytearray(open(path, "rb").read())
    hdr_and_index = min(len(data), 4096)
    rng = np.random.default_rng(0)
    opened = 0
    for trial in range(60):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            # Bias half the flips into the header/index tail where the
            # offsets live; the rest anywhere.
            if rng.integers(2):
                pos = int(rng.integers(0, 40))  # header
            else:
                pos = int(rng.integers(len(mut) - hdr_and_index, len(mut)))
            mut[pos] ^= int(rng.integers(1, 256))
        p = str(tmp_path / f"mut_{trial}.eovc")
        with open(p, "wb") as f:
            f.write(mut)
        try:
            ld = native.NativeClipLoader(p)
            opened += 1
            for ci in range(min(ld.n_clips, 4)):
                _, _, nf = ld.clip_info(ci)
                if 0 < nf <= 64:
                    ld.load_batch([ci], np.zeros((1, 2), np.int32)
                                  + min(1, nf - 1))
        except Exception:
            pass  # loud rejection is the contract; crashing is the bug
    # Sanity: the fuzz actually exercised the open path sometimes
    # (payload-only flips leave the index valid).
    assert opened > 0


def test_native_dct_scaled_decode(jpeg_shard, raw_shard):
    """DCT-domain scaled decode (VERDICT r3 #3): scale_denom=2 halves the
    reported dims, frames approximate a 2x2 box downsample of the full
    decode, raw shards and bad denominators refuse at open, and the
    EovcVideoDataset wiring sizes its pooled batches from the scaled
    dims."""
    if not native_available():
        pytest.skip("native toolchain unavailable")
    path, ds = jpeg_shard
    full = NativeClipLoader(path)
    half = NativeClipLoader(path, scale_denom=2)
    assert (half.height, half.width) == (full.height // 2, full.width // 2)

    idx = np.arange(4, dtype=np.int32)[None, :]
    f = full.load_batch([0], idx)[0].astype(np.float32)
    h = half.load_batch([0], idx)[0].astype(np.float32)
    # libjpeg's scaled IDCT approximates 2x2 box averaging of the full
    # decode; synthetic gratings carry real high-frequency content, so
    # the bound is loose but still excludes a wrong-phase/wrong-size read.
    box = f.reshape(4, h.shape[1], 2, h.shape[2], 2, 3).mean((2, 4))
    assert np.abs(h - box).mean() < 8.0
    full.close()
    half.close()

    # Raw shards refuse scaling; so does a non-power-of-two denominator.
    raw_path, _ = raw_shard
    with pytest.raises(IOError):
        NativeClipLoader(raw_path, scale_denom=2)
    with pytest.raises(IOError):
        NativeClipLoader(path, scale_denom=3)

    # Dataset-level wiring: pooled get_batch comes back at scaled dims.
    eds = EovcVideoDataset(path, jpeg_scale_denom=2)
    recs = eds.records[:2]
    bidx = np.zeros((2, 3), np.int32)
    out = eds.get_batch(recs, bidx)
    assert out.shape == (2, 3, 20, 28, 3)


def test_pack_class_name_sidecar(tmp_path):
    """pack_eovc writes a class-name sidecar and EovcVideoDataset auto-loads
    it: names must survive the pack -> extract chain (embodied fusion
    aligns virtual banks by class NAME; the container itself stores only
    integer labels, so without the sidecar a packed store degraded to
    numeric names and embodied alignment refused on every class)."""
    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=1, seed=0,
                               height=40, width=48)
    # Sharded production layout: sidecar at <dir>/classes.json.
    d = str(tmp_path / "shards")
    pack(ds, d, storage_short_side=36, codec="raw", clips_per_shard=2)
    assert EovcVideoDataset(d).class_names == list(ds.class_names)
    # Single file: <path>.classes.json.
    p = str(tmp_path / "one.eovc")
    pack(ds, p, storage_short_side=36, codec="raw")
    assert EovcVideoDataset(p).class_names == list(ds.class_names)
    # Explicit names override the sidecar.
    explicit = ["x", "y", "z"]
    assert EovcVideoDataset(p, class_names=explicit).class_names == explicit
    # A names list shorter than the stored label range refuses loudly
    # (wrong/stale sidecar or split for these shards).
    with pytest.raises(ValueError, match="shorter than"):
        EovcVideoDataset(p, class_names=["only_one"])


def test_repack_without_names_removes_stale_sidecar(tmp_path):
    """Re-packing a path from a dataset WITHOUT class names must remove the
    previous pack's sidecar — a stale name list auto-loads against the new
    labels and flows silently into embodied alignment whenever it is at
    least as long as the new class count."""
    import os

    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=1, seed=0,
                               height=40, width=48)

    class NoNames:
        records = ds.records
        class_names = []

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

    p = str(tmp_path / "one.eovc")
    pack(ds, p, storage_short_side=36, codec="raw")
    assert os.path.exists(p + ".classes.json")
    pack(NoNames(), p, storage_short_side=36, codec="raw")
    assert not os.path.exists(p + ".classes.json")
    # And the dataset now reports numeric fallback names, not stale ones.
    assert EovcVideoDataset(p).class_names[0] not in ds.class_names
