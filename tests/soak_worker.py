"""Scale-soak worker + shared fixtures (VERDICT r3 #5).

Run as a script it extracts SoakDataset clips into a FeatureStore and is
designed to be SIGKILLed mid-run by tests/test_scale_soak.py, which then
resumes in-process and checks store integrity at size. The dataset and
featurizer live here so the killed process and the resuming process are
guaranteed the same definitions.
"""

from __future__ import annotations

import sys

import numpy as np

from eov_tpu.data.datasets import VideoRecord

K, H, W, D = 4, 32, 40, 64
N_CLASSES = 20


class SoakDataset:
    """Deterministic near-zero-cost clips: content is a function of the
    clip ordinal only, so any process can verify any clip's feature."""

    def __init__(self, n_clips: int):
        self.class_names = [f"c{i:03d}" for i in range(N_CLASSES)]
        self.records = [
            VideoRecord(f"soak_{i:06d}", K * 3, i % N_CLASSES)
            for i in range(n_clips)
        ]

    @staticmethod
    def clip_value(video_id: str) -> int:
        return (int(video_id.split("_")[1]) * 31 + 7) % 251

    def get_frames(self, record: VideoRecord, indices) -> np.ndarray:
        v = self.clip_value(record.video_id)
        out = np.empty((len(indices), H, W, 3), np.uint8)
        out[...] = v
        return out


def cheap_feature_fn(frames_u8) -> np.ndarray:
    """[B, K, H, W, 3] u8 -> [B, D] f32; row b is b's mean pixel value
    broadcast, so the on-disk feature proves which clip produced it."""
    x = np.asarray(frames_u8, np.float32)
    m = x.reshape(x.shape[0], -1).mean(axis=1)
    return np.repeat(m[:, None], D, axis=1)


def expected_feature(video_id: str) -> np.ndarray:
    return np.full((D,), float(SoakDataset.clip_value(video_id)), np.float32)


def run(root: str, n_clips: int, flush_every: int) -> dict:
    from eov_tpu.data.store import FeatureStore
    from eov_tpu.extract import ExtractConfig, extract_features

    ds = SoakDataset(n_clips)
    store = FeatureStore(root, class_names=ds.class_names, process_index=0)
    cfg = ExtractConfig(
        num_segments=K, batch_clips=64, flush_every=flush_every,
        scale_size=H, crop_size=H,
    )
    return extract_features(
        ds, params=None, store=store, cfg=cfg,
        feature_fn=cheap_feature_fn,
    )


if __name__ == "__main__":
    root, n, fe = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    stats = run(root, n, fe)
    print(stats)
