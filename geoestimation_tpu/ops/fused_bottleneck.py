"""Pallas fused ResNet bottleneck block (inference).

Why: profiling the XLA path on v5e (see bench.py history) shows layer3/4
already run at ~94% MXU, but the 56x56 and 28x28 stages are HBM-bound —
each of the three convs in a bottleneck round-trips its activations
through HBM. This kernel keeps the whole block in VMEM: the input tile is
read once, conv1 -> conv2(3x3) -> conv3 -> residual add -> relu happen
on-chip, and only the block output is written back. BatchNorm is folded
into the conv weights host-side (inference running stats), so the
elementwise epilogue is just bias+relu.

TPU-native formulation of the 3x3 conv — chosen to cooperate with
Mosaic's (8, 128) tiling (a first attempt using zero-padded planes +
im2col reshapes hit pathological relayouts, ~1000x slower than XLA):

  * activations stay (N, H, W, C) with C on lanes, W on sublanes, W a
    multiple of 8 so (N*H*W, C) reshapes are tile-preserving bitcasts;
  * each of the 9 taps is a `pltpu.roll` (cheap: axis-2 rolls are sublane
    rotations, axis-1 rolls are untiled row permutes) + an iota-based
    border mask + one MXU matmul accumulated in fp32;
  * no padding, no scratch patch matrix, no sub-tile scatter writes.

Scope: stride-1 blocks with or without a 1x1 downsample projection (this
covers all of layer1 and layer2/3/4 blocks 1+; stride-2 stage entries stay
on XLA, which is near-roofline for them). Training uses the XLA path
(autodiff); this kernel is inference-only and flag-gated, with allclose
tests against the XLA reference (tests/test_fused_block.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold BatchNorm(scale, bias, mean, var) into a conv kernel + bias.

    conv(x, W) then BN == conv(x, W * g) + (bias - mean * g),
    g = scale / sqrt(var + eps), broadcast over the kernel's output-channel
    (last) axis.
    """
    g = bn_scale / np.sqrt(bn_var + eps)
    folded_kernel = kernel * g.reshape((1,) * (kernel.ndim - 1) + (-1,))
    folded_bias = bn_bias - bn_mean * g
    return folded_kernel, folded_bias


def _roll_w(s, shift, interpret):
    """Circular shift along the padded-width (sublane) axis of a 4D f32
    tensor. Mosaic's rotate handles 32-bit data only."""
    if shift == 0:
        return s
    if interpret:
        return jnp.roll(s, shift, axis=2)
    return pltpu.roll(s, shift % s.shape[2], 2)


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                       b3_ref, wd_ref, bd_ref, out_ref, ppad_ref, *, npi,
                       h, w, wp, cmid, cout, has_downsample, interpret,
                       carry=False):
    """npi image planes per grid step.

    Padded-width formulation: activations are carried at width `wp`
    (w+2 rounded up to a multiple of 8, e.g. 56 -> 64) with zero columns
    beyond w, so the 3x3 conv is 9 plain matmuls over views of one
    zero-padded buffer — row taps are free slices of the untiled H axis,
    column taps are sublane rotations whose wrap-around pulls only zeros
    (cols [w, wp) are zero, and rotating by ±1 moves a zero column across
    the seam). No per-tap masks (measured pathological on v5e), no
    non-tile-preserving reshapes (wp multiple of 8), and no sublane-offset
    copies at all: y1 is stored at column 0 so both the pad-in write and
    the final slice-out are tile-aligned.

    carry=True (the W % 8 != 0 stages, e.g. 28-wide layer2): x/out are
    carried AT width wp with zero columns in [w, wp) — padded once at the
    stage entry, sliced once at the stage exit — so every reshape stays
    tile-preserving. Two single broadcast multiplies against a resident
    (wp, C) column mask restore the zero-pad invariant (conv1's bias makes
    pad columns relu(b1), and conv2/conv3 leak garbage into them); they
    run on the store path, NOT between a roll and a matmul, which is what
    made per-tap masking pathological.

    Shapes (W_in == wp when carry else w):
      x_ref:    (npi, H, W_in, Cin)     bf16
      w1:       (Cin, Cmid)             bf16  (BN-folded)
      w2:       (9, Cmid, Cmid)         bf16  (one (in, out) slab per tap)
      w3:       (Cmid, Cout)            bf16
      wd:       (Cin, Cout)             bf16  (downsample proj or dummy)
      b*:       (1, C)                  fp32
      out_ref:  (npi, H, W_in, Cout)    bf16
      ppad_ref: (npi, H+2, wp, Cmid)    bf16 scratch, zero-bordered
    """
    cin = x_ref.shape[-1]
    w_in = wp if carry else w
    rows = npi * h * w_in
    rows_p = npi * h * wp
    x2d = x_ref[:].reshape(rows, cin)

    if carry:
        # resident column mask: 1 for data columns [0, w), 0 for pad
        colmask = (
            jax.lax.broadcasted_iota(jnp.int32, (wp, cmid), 0) < w
        ).astype(jnp.bfloat16)

    # conv1 (1x1) + bias + relu — one tall matmul for all npi images.
    y1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(jnp.bfloat16)

    # Zero-pad into (H+2, wp): valid data at rows [1, H+1), cols [0, w) —
    # column offset 0 keeps the write tile-aligned (w is a multiple of 8).
    # Scratch persists across grid steps and only the valid region is ever
    # rewritten, so the zero borders need initializing once.
    @pl.when(pl.program_id(0) == 0)
    def _init_pad():
        ppad_ref[:] = jnp.zeros_like(ppad_ref)

    if carry:
        # pad columns of x are zero, so y1 there is relu(b1): one masked
        # store re-establishes the zero border the rolls depend on
        y1 = y1.reshape(npi, h, wp, cmid) * colmask[None, None]
        ppad_ref[:, 1:h + 1, :, :] = y1
    else:
        ppad_ref[:, 1:h + 1, 0:w, :] = y1.reshape(npi, h, w, cmid)

    # conv2 (3x3): 3 column rotations of the padded buffer (zero borders
    # make wrap-around harmless), 3 free row slices each, fp32 acc over
    # the padded width.
    acc = jnp.zeros((rows_p, cmid), jnp.float32)
    for dx in range(3):
        rolled = _roll_w(ppad_ref[:].astype(jnp.float32), 1 - dx,
                         interpret).astype(jnp.bfloat16)
        for dy in range(3):
            k = dy * 3 + dx
            view = rolled[:, dy:dy + h, :, :].reshape(rows_p, cmid)
            acc += jnp.dot(view, w2_ref[k],
                           preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(jnp.bfloat16)

    # conv3 (1x1) + bias on the padded grid (garbage columns are dropped
    # by the final slice / output mask; they never feed neighboring
    # positions). The non-carry slice [0, w) is tile-aligned.
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = (y3 + b3_ref[:]).reshape(npi, h, wp, cout)
    if carry:
        y3v = y3.reshape(rows, cout)
    else:
        y3v = y3[:, :, 0:w, :].reshape(rows, cout)

    # residual
    if has_downsample:
        res = jnp.dot(x2d, wd_ref[:], preferred_element_type=jnp.float32)
        res = res + bd_ref[:]
    else:
        res = x2d.astype(jnp.float32)

    out = jnp.maximum(y3v + res, 0.0).astype(jnp.bfloat16)
    if carry:
        # conv3's bias (and conv2 leakage) made pad columns non-zero;
        # restore the carried zero-pad invariant for the next block
        outmask = (
            jax.lax.broadcasted_iota(jnp.int32, (wp, cout), 0) < w
        ).astype(jnp.bfloat16)
        out = out.reshape(npi, h, wp, cout) * outmask[None, None]
        out_ref[:] = out
    else:
        out_ref[:] = out.reshape(npi, h, w, cout)


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                     images_per_tile: int = 1, interpret: bool = False,
                     logical_w: int = None):
    """Fused stride-1 bottleneck: relu(conv3(relu(conv2(relu(conv1(x)))))
    + residual).

    Args:
      x: (B, H, W, Cin) bf16; W must be a multiple of 8 (tile-preserving
        reshapes).
      w1: (Cin, Cmid) bf16 BN-folded; b1: (Cmid,) fp32.
      w2: (3, 3, Cmid, Cmid) bf16 BN-folded; b2: (Cmid,) fp32.
      w3: (Cmid, Cout) bf16 BN-folded; b3: (Cout,) fp32.
      wd/bd: optional (Cin, Cout)/(Cout,) downsample projection (folded).
      images_per_tile: images per grid step (raise for small planes,
        e.g. 28x28, to get taller matmuls; must divide B).
      logical_w: carry mode for stages whose natural width is not a
        multiple of 8 (layer2's 28): x is (B, H, W, Cin) with real data in
        columns [0, logical_w) and ZEROS in [logical_w, W) — pad once at
        the stage entry, chain carry-mode blocks, slice once at the exit.
        Output keeps the same layout (pad columns zeroed).

    Returns (B, H, W, Cout) bf16 (same carried width in carry mode).
    """
    b, h, w_in, cin = x.shape
    cmid = w1.shape[-1]
    cout = w3.shape[-1]
    has_ds = wd is not None
    npi = images_per_tile
    carry = logical_w is not None and logical_w != w_in
    if b % npi:
        raise ValueError(f"batch {b} not divisible by images_per_tile {npi}")
    if w_in % 8:
        raise ValueError(f"W={w_in} must be a multiple of 8")
    if carry:
        w = logical_w
        wp = w_in
        if wp < w + 2:
            raise ValueError(
                f"carried width {wp} must cover logical {w} + 2 halo"
            )
    else:
        w = w_in
        wp = -(-(w + 2) // 8) * 8  # padded width: halo + round to sublanes

    w2p = jnp.asarray(w2, jnp.bfloat16).reshape(9, cmid, cmid)
    if not has_ds:
        wd = jnp.zeros((cin, cout), jnp.bfloat16)  # dummy, unused
        bd = jnp.zeros((cout,), jnp.float32)

    kernel = functools.partial(
        _bottleneck_kernel, npi=npi, h=h, w=w, wp=wp, cmid=cmid, cout=cout,
        has_downsample=has_ds, interpret=interpret, carry=carry,
    )

    flops = 2 * b * h * w * (cin * cmid + 9 * cmid * cmid + cmid * cout
                             + (cin * cout if has_ds else 0))
    bytes_accessed = 2 * (b * h * w_in * (cin + cout))

    return pl.pallas_call(
        kernel,
        grid=(b // npi,),
        in_specs=[
            pl.BlockSpec((npi, h, w_in, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2p
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd
        ],
        out_specs=pl.BlockSpec((npi, h, w_in, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w_in, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((npi, h + 2, wp, cmid), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(w1, jnp.bfloat16),
        jnp.asarray(b1, jnp.float32).reshape(1, -1),
        w2p,
        jnp.asarray(b2, jnp.float32).reshape(1, -1),
        jnp.asarray(w3, jnp.bfloat16),
        jnp.asarray(b3, jnp.float32).reshape(1, -1),
        jnp.asarray(wd, jnp.bfloat16),
        jnp.asarray(bd, jnp.float32).reshape(1, -1),
    )


def _bottleneck_s2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                          b3_ref, wd_ref, bd_ref, out_ref, ppad_ref, *,
                          npi, h, w, wp, cmid, cout, interpret):
    """Stride-2 bottleneck (stage entries: conv2 stride 2 + strided
    downsample projection). Same padded-width/no-mask scheme as stride 1;
    the stride enters as a one-time column deinterleave of the rolled
    padded buffer (even/odd planes) plus strided row slices of the untiled
    H axis — taps stay plain matmuls, wrap-around still touches only
    zeros. Output carried at padded width wp/2.

    Shapes: x (npi, H, W, Cin) -> out (npi, H/2, W/2, Cout); wd required.
    """
    cin = x_ref.shape[-1]
    h2, w2 = h // 2, w // 2
    wp2 = wp // 2
    rows_in = npi * h * w
    rows_out = npi * h2 * wp2
    x2d = x_ref[:].reshape(rows_in, cin)

    y1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[:], 0.0).astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _init_pad():
        ppad_ref[:] = jnp.zeros_like(ppad_ref)

    ppad_ref[:, 1:h + 1, 0:w, :] = y1.reshape(npi, h, w, cmid)

    # Q[c] = P[c-1]: aligns column parity so tap dx reads
    # Q[2*w_ + dx] = y1 col (2*w_ + dx - 1); Q[0] pulls a zero pad column.
    q = _roll_w(ppad_ref[:].astype(jnp.float32), 1, interpret)
    q = q.astype(jnp.bfloat16)
    qe = q[:, :, 0::2, :]    # (npi, h+2, wp2, cmid): dx=0 taps
    qo = q[:, :, 1::2, :]    # dx=1 taps
    # dx=2 taps: Qe shifted one column left (no wrap inside [0, w2)).
    qe2 = _roll_w(qe.astype(jnp.float32), wp2 - 1, interpret)
    qe2 = qe2.astype(jnp.bfloat16)

    acc = jnp.zeros((rows_out, cmid), jnp.float32)
    for dy in range(3):
        for dx, buf in enumerate((qe, qo, qe2)):
            view = buf[:, dy:dy + 2 * h2:2, :, :]
            acc += jnp.dot(view.reshape(rows_out, cmid),
                           w2_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(jnp.bfloat16)

    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = (y3 + b3_ref[:]).reshape(npi, h2, wp2, cout)[:, :, 0:w2, :]

    # strided downsample projection on the input
    xs = x_ref[:, 0::2, 0::2, :].reshape(npi * h2 * w2, cin)
    res = jnp.dot(xs, wd_ref[:], preferred_element_type=jnp.float32)
    res = (res + bd_ref[:]).reshape(npi, h2, w2, cout)

    out = jnp.maximum(y3 + res, 0.0).astype(jnp.bfloat16)
    out_ref[:] = out


def fused_bottleneck_s2(x, w1, b1, w2, b2, w3, b3, wd, bd,
                        images_per_tile: int = 1, interpret: bool = False):
    """Fused stride-2 bottleneck (stage entry blocks). Requires the
    downsample projection (wd/bd); H and W must be even, W a multiple
    of 8. Returns (B, H/2, W/2, Cout) bf16."""
    b, h, w, cin = x.shape
    cmid = w1.shape[-1]
    cout = w3.shape[-1]
    npi = images_per_tile
    if b % npi:
        raise ValueError(f"batch {b} not divisible by images_per_tile {npi}")
    if w % 8 or h % 2 or w % 2:
        raise ValueError(f"need even H/W with W%8==0; got {h}x{w}")
    wp = -(-(w + 2) // 16) * 16  # halo, multiple of 16 so wp/2 % 8 == 0

    w2p = jnp.asarray(w2, jnp.bfloat16).reshape(9, cmid, cmid)
    kernel = functools.partial(
        _bottleneck_s2_kernel, npi=npi, h=h, w=w, wp=wp, cmid=cmid,
        cout=cout, interpret=interpret,
    )
    h2, w2_ = h // 2, w // 2
    flops = 2 * b * (h * w * cin * cmid + h2 * w2_ * (9 * cmid * cmid
                     + cmid * cout + cin * cout))
    bytes_accessed = 2 * b * (h * w * cin + h2 * w2_ * cout)

    return pl.pallas_call(
        kernel,
        grid=(b // npi,),
        in_specs=[
            pl.BlockSpec((npi, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((npi, h2, w2_, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2_, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((npi, h + 2, wp, cmid), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(w1, jnp.bfloat16),
        jnp.asarray(b1, jnp.float32).reshape(1, -1),
        w2p,
        jnp.asarray(b2, jnp.float32).reshape(1, -1),
        jnp.asarray(w3, jnp.bfloat16),
        jnp.asarray(b3, jnp.float32).reshape(1, -1),
        jnp.asarray(wd, jnp.bfloat16),
        jnp.asarray(bd, jnp.float32).reshape(1, -1),
    )


def xla_bottleneck_reference(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                             stride: int = 1):
    """Plain-XLA reference implementation (same folded-weight math)."""
    x = jnp.asarray(x, jnp.bfloat16)

    def conv1x1(v, k, bias, s=1):
        k4 = jnp.asarray(k, jnp.bfloat16).reshape(
            1, 1, k.shape[-2], k.shape[-1]
        )
        out = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), k4, window_strides=(s, s),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out + bias

    y = jnp.maximum(conv1x1(x, w1, b1), 0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, jnp.asarray(w2, jnp.bfloat16),
        window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b2
    y = jnp.maximum(y, 0).astype(jnp.bfloat16)
    y = conv1x1(y, w3, b3)
    if wd is not None:
        res = conv1x1(x, wd, bd, s=stride)
    else:
        res = x.astype(jnp.float32)
    return jnp.maximum(y + res, 0).astype(jnp.bfloat16)
