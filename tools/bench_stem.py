"""Int8 stem+pool formulation A/Bs (the last identified perf fat).

The stem (7x7/s2 conv + 3x3/s2 maxpool) costs ~4.4 ms of the int8 step
(docs/PERF_NOTES.md): the conv's MXU utilization is capped by C_in — the
direct form puts 3 channels on lanes, the shipped space-to-depth form 12.
This harness times, standalone on hardware, reformulations that raise
C_in by folding kernel taps into channels host-side (im2col along W
only, so the materialized intermediate stays small):

  s2d      (shipped)  2x2 pixel blocks -> 4x4 conv, C_in=12
  direct   (control)  7x7/s2 conv, C_in=3
  hfold48  s2d + 4 W-tap fold -> (4,1) conv, C_in=48
  hfold24  s2d + 2 W-tap fold -> (4,2) conv, C_in=24

Every variant is bit-identical integer math (asserted before timing):
same int8 weights, same requant, same pool. Pool mode is a second axis
(reduce_window vs slices) for the winning conv.

Usage: python tools/bench_stem.py [--crops N] [--iters N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from geoestimation_tpu.models.quant import (  # noqa: E402
    _QMAX, _conv_s8, max_pool_3x3_s2)


def _time(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # tunnel-safe readback
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def build_variants(stem_q, stem_mult, stem_bias, pad_val, pool_mode):
    """Each variant: (B, 224, 224, 3) s8 crops -> pooled (B, 56, 56, 64)
    s8. stem_q: (7,7,3,64) int8 weights; mult/bias: (64,) f32 requant."""
    stem_mult = jnp.asarray(stem_mult, jnp.float32)
    stem_bias = jnp.asarray(stem_bias, jnp.float32)
    pad_val = jnp.asarray(pad_val, jnp.int8)

    def requant(y32):
        y = y32.astype(jnp.float32) * stem_mult + stem_bias
        return jnp.clip(jnp.round(y), 0.0, _QMAX).astype(jnp.int8)

    # shared host-side constants
    k8 = np.zeros((8, 8) + stem_q.shape[2:], np.int8)
    k8[:7, :7] = stem_q
    k4 = (k8.reshape(4, 2, 4, 2, *stem_q.shape[2:])
          .transpose(0, 2, 1, 3, 4, 5)
          .reshape(4, 4, 2 * 2 * stem_q.shape[2], stem_q.shape[3]))
    k4j = jnp.asarray(k4)
    # hfold48: fold the 4 W block-taps into channels -> (4,1,48,64)
    k48 = jnp.asarray(k4.reshape(4, 1, 4 * 12, 64))
    # hfold24: fold adjacent W-tap PAIRS into channels -> kernel
    # (4,2,24,64) with W-dilation 2: tap DX = 2*dxb + dxlo where dxb is
    # the (dilated) kernel W index and dxlo the channel-fold index
    k24 = jnp.asarray(k4.reshape(4, 2, 2, 12, 64).reshape(4, 2, 24, 64))

    def pad_s2d(x_s8):
        b, h, w, c = x_s8.shape
        buf = jnp.broadcast_to(pad_val, (b, h + 8, w + 8, c)).astype(
            jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, x_s8, (0, 3, 3, 0))
        hb, wb = (h + 8) // 2, (w + 8) // 2
        return (buf.reshape(b, hb, 2, wb, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, hb, wb, 2 * 2 * c)), h, w

    def s2d(x_s8):
        x2, h, w = pad_s2d(x_s8)
        ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        y = _conv_s8(x2, k4j)[:, :ho, :wo]
        return max_pool_3x3_s2(requant(y), mode=pool_mode)

    def direct(x_s8):
        b, h, w, c = x_s8.shape
        buf = jnp.broadcast_to(pad_val, (b, h + 6, w + 6, c)).astype(
            jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, x_s8, (0, 3, 3, 0))
        y = _conv_s8(buf, jnp.asarray(stem_q), s=2)
        return max_pool_3x3_s2(requant(y), mode=pool_mode)

    def hfold48(x_s8):
        x2, h, w = pad_s2d(x_s8)
        ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        wb = x2.shape[2]
        x4 = jnp.concatenate(
            [x2[:, :, dx:wb - 3 + dx, :] for dx in range(4)], axis=-1)
        y = _conv_s8(x4, k48)[:, :ho, :wo]
        return max_pool_3x3_s2(requant(y), mode=pool_mode)

    def hfold24(x_s8):
        x2, h, w = pad_s2d(x_s8)
        ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        wb = x2.shape[2]
        x2b = jnp.concatenate(
            [x2[:, :, dx:wb - 1 + dx, :] for dx in range(2)], axis=-1)
        y = jax.lax.conv_general_dilated(
            x2b, k24, window_strides=(1, 1), padding="VALID",
            rhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)[:, :ho, :wo]
        return max_pool_3x3_s2(requant(y), mode=pool_mode)

    return {"s2d": s2d, "direct": direct, "hfold48": hfold48,
            "hfold24": hfold24}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--crops", type=int, default=1120,
                   help="total crop batch (1120 = bench b112 x ten-crop)")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--pool_modes", default="reduce_window")
    args = p.parse_args(argv)

    rng = np.random.default_rng(0)
    stem_q = rng.integers(-127, 128, (7, 7, 3, 64)).astype(np.int8)
    stem_mult = (rng.random(64).astype(np.float32) + 0.5) * 1e-3
    stem_bias = rng.standard_normal(64).astype(np.float32)
    pad_val = np.array([-14, -3, 9], np.int8)

    print(f"backend={jax.default_backend()} crops={args.crops}")

    # bit-identical check at small scale, all variants vs s2d
    small = jnp.asarray(rng.integers(-128, 128, (4, 224, 224, 3)), jnp.int8)
    fns = {name: jax.jit(fn) for name, fn in build_variants(
        stem_q, stem_mult, stem_bias, pad_val, "reduce_window").items()}
    ref = np.asarray(fns["s2d"](small))
    for name, fn in fns.items():
        got = np.asarray(fn(small))
        assert got.shape == ref.shape, (name, got.shape)
        neq = int((got != ref).sum())
        assert neq == 0, f"{name}: {neq} mismatching elements vs s2d"
    print("bit-identical: OK (all variants)")

    x = jnp.asarray(
        rng.integers(-128, 128, (args.crops, 224, 224, 3)), jnp.int8)
    for pool_mode in args.pool_modes.split(","):
        fns = {name: jax.jit(fn) for name, fn in build_variants(
            stem_q, stem_mult, stem_bias, pad_val, pool_mode).items()}
        for name, fn in fns.items():
            ms = _time(fn, x, iters=args.iters)
            print(f"{name:>8} pool={pool_mode:<14} {ms:7.2f} ms "
                  f"({args.crops / ms * 1000:8.0f} crops/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
