"""A/B benchmark: the LITERAL config-4 fused program vs the cache path.

BASELINE.json:10's exact wording is "fused preprocess + backbone +
similarity over 64 episodes/step". Production deliberately runs the
backbone once per CLIP (extract -> cache -> cached 64-episode eval steps);
DESIGN.md §4b closed that decision by recompute arithmetic (~2.5x wasted
conv FLOPs at the 600-episode protocol). VERDICT r4 weak #1: the literal
fused program had never been BUILT, so the closure rested on a
declaration. This bench builds it and measures both sides on one device:

  A (literal spec): ONE jitted step — sample 64 episodes -> gather raw
    uint8 episode members from a device-resident clip bank -> preprocess
    -> backbone -> TSN consensus -> similarity -> per-episode accuracy.
    The backbone runs inside a lax.map over production-batch-shaped chunks
    (same conv shapes as extract's program — the fairest possible fusion).
  B (production): featurize the SAME bank once with the SAME feature_fn
    (timed), then run the cached eval step on the features.

Parity rail: both sides run the identical canonical episode protocol
(same key, same ordinals), so their per-episode accuracies must agree —
the recorded acc_max_delta is the bitwise-or-rounding difference of
featurizing the same frames in episode-gather order vs bank order.

Reports per-step device time and episodes/s for both, plus the protocol
totals the §4b arithmetic predicts: at E episodes, A spends
E/64 * step_s_fused while B spends extract_bank_s + E/64 * step_s_cached.

ONE JSON line. Env knobs: EOV_FUSED_CLASSES (24), EOV_FUSED_CLIPS
(25/class — bank size; HBM-bounded stand-in for the 24x100 meta-test
split; per-step work is bank-size-independent), EOV_FUSED_FRAMES (8),
EOV_FUSED_HW (256x340 — production decode geometry), EOV_FUSED_EPS_STEP
(64), EOV_FUSED_ARCH (resnet50), EOV_FUSED_CHUNK (64 — backbone clips per
map step), EOV_FUSED_ITERS, EOV_FUSED_WINDOW, EOV_FUSED_SCALE/CROP,
EOV_FUSED_EPISODES (600 — protocol length for the totals).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    import jax

    from eov_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import functools

    import jax.numpy as jnp
    import numpy as np

    from eov_tpu import episodes as ep
    from eov_tpu import eval as ev
    from eov_tpu.extract import ExtractConfig, make_feature_fn
    from eov_tpu.models import get_arch
    from eov_tpu.ops import similarity

    platform = jax.devices()[0].platform
    c = int(os.environ.get("EOV_FUSED_CLASSES", "24"))
    m = int(os.environ.get("EOV_FUSED_CLIPS", "25"))
    k = int(os.environ.get("EOV_FUSED_FRAMES", "8"))
    fh, _, fw = os.environ.get("EOV_FUSED_HW", "256x340").partition("x")
    fh, fw = int(fh), int(fw)
    e_step = int(os.environ.get("EOV_FUSED_EPS_STEP", "64"))
    arch = os.environ.get("EOV_FUSED_ARCH", "resnet50")
    chunk = int(os.environ.get("EOV_FUSED_CHUNK", "64"))
    iters = int(os.environ.get("EOV_FUSED_ITERS", "3"))
    window = int(os.environ.get("EOV_FUSED_WINDOW", "2"))
    scale = int(os.environ.get("EOV_FUSED_SCALE", "256"))
    crop = int(os.environ.get("EOV_FUSED_CROP", "224"))
    protocol_e = int(os.environ.get("EOV_FUSED_EPISODES", "600"))
    n_way, k_shot, n_query = 5, 1, 1
    s = k_shot + n_query

    ecfg = ExtractConfig(
        num_segments=k, arch=arch, batch_clips=chunk,
        scale_size=scale, crop_size=crop,
    )
    ctor, _, _ = get_arch(arch)
    model = ctor(dtype=jnp.dtype(ecfg.compute_dtype))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3))
    )
    feature_fn = make_feature_fn(params, ecfg)

    total = e_step * n_way * s  # clips featurized per fused step
    if total % chunk:
        chunk = total  # single chunk — keeps the program valid at any size
    n_chunks = total // chunk

    rng = np.random.default_rng(0)
    bank = rng.integers(0, 256, size=(c, m, k, fh, fw, 3), dtype=np.uint8)
    bank_dev = jax.device_put(jnp.asarray(bank))
    counts = jax.device_put(jnp.full((c,), m, jnp.int32))

    # ---- A: the literal config-4 program --------------------------------
    @jax.jit
    def fused_step(key, base_ordinal, clips_u8, counts):
        idx = ep.sample_episodes(
            key, counts, n_way=n_way, k_shot=k_shot, n_query=n_query,
            n_episodes=e_step, max_clips=clips_u8.shape[1],
            base_ordinal=base_ordinal,
        )
        member = jnp.concatenate([idx.support_idx, idx.query_idx], axis=-1)
        # Raw uint8 members: [E, N, S, K, H, W, 3].
        clips = clips_u8[idx.class_ids[..., None], member]
        flat = clips.reshape(n_chunks, chunk, k, fh, fw, 3)
        # Backbone at the production batch shape; the jitted feature_fn
        # inlines here — preprocess+backbone+consensus fused per chunk.
        feats = jax.lax.map(feature_fn, flat)  # [n_chunks, chunk, D]
        feats = feats.reshape(e_step, n_way, s, -1)
        sup, qry = feats[:, :, :k_shot], feats[:, :, k_shot:]
        mask = jnp.ones(sup.shape[:-1], jnp.float32)
        preds = similarity.predict(
            qry.reshape(e_step, n_way * n_query, -1), sup, mask,
            metric="cosine", fusion="max",
        )
        labels = ep.query_labels(n_way, n_query)[None, :]
        return jnp.mean((preds == labels).astype(jnp.float32), axis=-1)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def fused_window(key0, clips_u8, counts, n_steps):
        def body(key, step_i):
            acc = fused_step(key, step_i * e_step, clips_u8, counts)
            return key, jnp.mean(acc)
        _, accs = jax.lax.scan(
            body, key0, jnp.arange(n_steps, dtype=jnp.int32)
        )
        return accs

    # ---- B: production extract-once + cached eval -----------------------
    pad = (-(c * m) % chunk)
    bank_flat = bank.reshape(c * m, k, fh, fw, 3)
    if pad:
        bank_flat = np.concatenate(
            [bank_flat, bank_flat[:pad]], axis=0)
    bank_flat = jax.device_put(jnp.asarray(
        bank_flat.reshape(-1, chunk, k, fh, fw, 3)))

    @jax.jit
    def extract_bank(flat_chunks):
        return jax.lax.map(feature_fn, flat_chunks)

    np.asarray(extract_bank(bank_flat))  # compile + warm
    t0 = time.perf_counter()
    feats_np = np.asarray(extract_bank(bank_flat))  # host read = sync
    extract_bank_s = time.perf_counter() - t0
    feats_np = feats_np.reshape(-1, feats_np.shape[-1])[: c * m]
    features = jax.device_put(
        jnp.asarray(feats_np.reshape(c, m, -1), jnp.float32))

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def cached_window(key0, features, counts, n_steps):
        def body(key, step_i):
            acc = ev.eval_step(
                key, step_i * e_step, features, counts, None, None,
                n_way=n_way, k_shot=k_shot, n_query=n_query, n_step=e_step,
                metric="cosine", fusion="max", matcher="xla",
            )
            return key, jnp.mean(acc)
        _, accs = jax.lax.scan(
            body, key0, jnp.arange(n_steps, dtype=jnp.int32)
        )
        return accs

    del bank_flat  # free the extraction staging buffer's HBM before A runs
    key = jax.random.PRNGKey(0)

    # Parity rail: identical protocol -> identical per-step accuracies.
    acc_fused = np.asarray(fused_window(key, bank_dev, counts, window))
    acc_cached = np.asarray(cached_window(key, features, counts, window))
    acc_max_delta = float(np.max(np.abs(acc_fused - acc_cached)))

    def timed(fn, *args):
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn(jax.random.PRNGKey(i), *args))  # host read = sync
            times.append((time.perf_counter() - t0) / window)
        return statistics.median(times), times

    fused_s, fused_ts = timed(
        lambda kk: fused_window(kk, bank_dev, counts, window))
    cached_s, cached_ts = timed(
        lambda kk: cached_window(kk, features, counts, window))

    n_steps_protocol = -(-protocol_e // e_step)
    protocol_fused_s = n_steps_protocol * fused_s
    protocol_cached_s = extract_bank_s + n_steps_protocol * cached_s
    print(json.dumps({
        "metric": "fused_vs_cached_eval_step",
        "value": round(fused_s / max(cached_s, 1e-12), 1),
        "unit": "x_slower_per_step",
        "vs_baseline": None,
        "detail": {
            "platform": platform,
            "arch": arch,
            "bank_cmk_hw": [c, m, k, fh, fw],
            "episodes_per_step": e_step,
            "backbone_chunk": chunk,
            "fused_step_s": round(fused_s, 4),
            "fused_eps_per_s": round(e_step / fused_s, 2),
            "fused_step_s_band": [
                round(min(fused_ts), 4), round(max(fused_ts), 4)],
            "cached_step_s": round(cached_s, 6),
            "cached_eps_per_s": round(e_step / cached_s, 1),
            "cached_step_s_band": [
                round(min(cached_ts), 6), round(max(cached_ts), 6)],
            "extract_bank_s": round(extract_bank_s, 3),
            "protocol_episodes": protocol_e,
            "protocol_fused_s": round(protocol_fused_s, 3),
            "protocol_cached_s_incl_extract": round(protocol_cached_s, 3),
            "protocol_speedup_cached": round(
                protocol_fused_s / max(protocol_cached_s, 1e-12), 2),
            "acc_max_delta": acc_max_delta,
            "window": window,
            "iters": iters,
            "params": "random-init (throughput is weight-value-independent)",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
