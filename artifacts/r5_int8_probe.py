"""Mosaic int8 capability probe for an int8 fused stage-1 stack (r5).

BASELINE.md r5's xprof attribution of the int8 XLA path showed stage-1
still bandwidth-bound; the next lever is int8-inside-Pallas stage-1
(ops/pallas_bottleneck.py's design with s8xs8->s32 matmuls and in-kernel
requant). That kernel is only worth writing if Mosaic lowers, ON HARDWARE
(interpret mode proves nothing — CLAUDE.md trap), every primitive it
needs. Each case below is one minimal pallas_call per primitive, checked
against the XLA/numpy reference:

  1. int8 x int8 -> int32 dot_general (the MXU contraction)
  2. int32 -> f32 cast + per-channel scale (dequant epilogue)
  3. f32 -> round -> clip -> int8 cast (the requant between convs)
  4. int8 scratch store + UNALIGNED static row-slice reads (the 9
     shifted 3x3 taps; int8 sublane tile is 32, offsets are +-1, +-w)
  5. int8 tap * int8 0/1 mask (edge kill) feeding the dot

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/.axon_site:.. python
artifacts/r5_int8_probe.py  -> one PASS/FAIL line per case + JSON tail.
Exit 0 iff all pass. Results recorded in BASELINE.md r5 either way.
"""

from __future__ import annotations

import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, CI, CO = 512, 64, 256  # rows, in/out channels (stage-1-like, small)


def _case(name, fn):
    try:
        fn()
        print(f"PASS {name}")
        return name, "pass", ""
    except Exception as e:  # noqa: BLE001 — probe records any failure mode
        tb = traceback.format_exc(limit=3)
        msg = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"FAIL {name}: {msg}")
        print(tb)
        return name, "fail", msg


def case_dot_i8():
    rng = np.random.default_rng(0)
    a = rng.integers(-127, 128, (R, CI), dtype=np.int8)
    b = rng.integers(-127, 128, (CI, CO), dtype=np.int8)

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, CO), jnp.int32),
    )(jnp.asarray(a), jnp.asarray(b))
    ref = a.astype(np.int32) @ b.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def case_dequant_scale():
    rng = np.random.default_rng(1)
    acc = rng.integers(-(2**20), 2**20, (R, CO), dtype=np.int32)
    scale = rng.uniform(1e-4, 1e-2, (1, CO)).astype(np.float32)

    def k(acc_ref, s_ref, o_ref):
        o_ref[:] = acc_ref[:].astype(jnp.float32) * s_ref[:]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, CO), jnp.float32),
    )(jnp.asarray(acc), jnp.asarray(scale))
    np.testing.assert_allclose(
        np.asarray(out), acc.astype(np.float32) * scale, rtol=1e-6)


def case_requant_f32_to_i8():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((R, CI)) * 50).astype(np.float32)
    inv_a = np.float32(1.7)

    def k(x_ref, o_ref):
        q = jnp.clip(jnp.round(x_ref[:] * inv_a), -127.0, 127.0)
        o_ref[:] = q.astype(jnp.int8)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, CI), jnp.int8),
    )(jnp.asarray(x))
    ref = np.clip(np.round(x * inv_a), -127.0, 127.0).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(out), ref)


def case_i8_scratch_shifted_taps():
    # The 3x3-as-9-shifted-matmuls pattern: write int8 rows into a padded
    # scratch at offset s, read taps at s + {-w-1 .. w+1} (unaligned for
    # int8's 32-row sublane tile), matmul each against an int8 weight.
    w = 64                     # flat row width (pixels per image row)
    h = R // w                 # 8
    p = h * w
    s = w + 1
    rng = np.random.default_rng(3)
    x = rng.integers(-127, 128, (p, CI), dtype=np.int8)
    wt = rng.integers(-16, 17, (9, CI, CI), dtype=np.int8)

    def k(x_ref, w_ref, o_ref, pad_ref):
        pad_ref[:] = jnp.zeros(pad_ref.shape, pad_ref.dtype)
        pad_ref[s : s + p] = x_ref[:]
        acc = jnp.zeros((p, CI), jnp.int32)
        for ky in range(3):
            for kx in range(3):
                off = s + (ky - 1) * w + (kx - 1)
                tap = pad_ref[off : off + p]
                acc = acc + jax.lax.dot_general(
                    tap, w_ref[ky * 3 + kx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        o_ref[:] = acc

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((p, CI), jnp.int32),
        scratch_shapes=[pltpu.VMEM(((h + 2) * w + 8, CI), jnp.int8)],
    )(jnp.asarray(x), jnp.asarray(wt))

    pad = np.zeros(((h + 2) * w + 8, CI), np.int32)
    pad[s : s + p] = x.astype(np.int32)
    ref = np.zeros((p, CI), np.int32)
    for ky in range(3):
        for kx in range(3):
            off = s + (ky - 1) * w + (kx - 1)
            ref += pad[off : off + p] @ wt[ky * 3 + kx].astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def case_i8_mask_mul():
    w = 64
    p = R
    rng = np.random.default_rng(4)
    x = rng.integers(-127, 128, (p, CI), dtype=np.int8)
    wt = rng.integers(-16, 17, (CI, CI), dtype=np.int8)

    def k(x_ref, w_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
        mask = (col != 0).astype(jnp.int8)
        tap = x_ref[:] * mask
        o_ref[:] = jax.lax.dot_general(
            tap, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((p, CI), jnp.int32),
    )(jnp.asarray(x), jnp.asarray(wt))
    col = (np.arange(p) % w)[:, None]
    ref = (x.astype(np.int32) * (col != 0)) @ wt.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def case_i8_mask_select():
    """The i8_mask_mul fallback the kernel actually uses: jnp.where with a
    broadcast (p,1) bool condition instead of an i8 multiply (vector i8
    arith.muli failed to legalize on this hardware — first probe run)."""
    w = 64
    p = R
    rng = np.random.default_rng(4)
    x = rng.integers(-127, 128, (p, CI), dtype=np.int8)
    wt = rng.integers(-16, 17, (CI, CI), dtype=np.int8)

    def k(x_ref, w_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % w
        tap = jnp.where(col != 0, x_ref[:], jnp.int8(0))
        o_ref[:] = jax.lax.dot_general(
            tap, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((p, CI), jnp.int32),
    )(jnp.asarray(x), jnp.asarray(wt))
    col = (np.arange(p) % w)[:, None]
    ref = (x.astype(np.int32) * (col != 0)) @ wt.astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def main() -> int:
    import os

    # Runs as `python artifacts/r5_int8_probe.py` — repo root on sys.path.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from eov_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")
    results = [
        _case("dot_i8_i8_i32", case_dot_i8),
        _case("dequant_i32_f32_scale", case_dequant_scale),
        _case("requant_f32_round_clip_i8", case_requant_f32_to_i8),
        _case("i8_scratch_shifted_taps", case_i8_scratch_shifted_taps),
        _case("i8_mask_mul", case_i8_mask_mul),
        _case("i8_mask_select", case_i8_mask_select),
    ]
    # i8_mask_mul is informational (known Mosaic gap on this hardware —
    # the kernel uses the select formulation instead); the exit criterion
    # covers exactly the primitives ops/pallas_bottleneck_int8.py emits.
    needed = {"dot_i8_i8_i32", "dequant_i32_f32_scale",
              "requant_f32_round_clip_i8", "i8_scratch_shifted_taps",
              "i8_mask_select"}
    ok = all(s == "pass" for n, s, _ in results if n in needed)
    print(json.dumps({
        "probe": "r5_int8_pallas",
        "platform": dev.platform,
        "results": {n: s for n, s, _ in results},
        "errors": {n: m for n, s, m in results if s == "fail"},
        "kernel_primitives_pass": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
