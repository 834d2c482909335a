"""Hardware A/B timing for the Pallas fused-bottleneck kernels.

Times each kernel variant against its plain-XLA reference on whatever
backend jax has (intended: the real TPU chip). Prints one table row per
case. This is the measurement tool behind docs/PERF_NOTES.md's round-2
checklist — run it whenever the kernels or the XLA baseline change.

Timing methodology (see PERF_NOTES "Environment gotchas"): the tunneled
axon backend under-reports with block_until_ready, so every timed region
is fenced with a scalar readback whose RTT is amortized over `iters`.

Usage: python tools/bench_kernels.py [case ...]
Cases: layer1 layer2carry layer2entry layer3entry e2e (default: all micro)
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from geoestimation_tpu.ops.fused_bottleneck import (  # noqa: E402
    fused_bottleneck,
    fused_bottleneck_s2,
    xla_bottleneck_reference,
)


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _mk(shape, key, dtype=jnp.bfloat16, scale=0.05):
    return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale
            ).astype(dtype)


def _block_weights(cin, cmid, cout, ds, key0=0):
    w1 = _mk((cin, cmid), key0)
    b1 = _mk((cmid,), key0 + 1, jnp.float32)
    w2 = _mk((3, 3, cmid, cmid), key0 + 2)
    b2 = _mk((cmid,), key0 + 3, jnp.float32)
    w3 = _mk((cmid, cout), key0 + 4)
    b3 = _mk((cout,), key0 + 5, jnp.float32)
    if ds:
        wd = _mk((cin, cout), key0 + 6)
        bd = _mk((cout,), key0 + 7, jnp.float32)
    else:
        wd = bd = None
    return w1, b1, w2, b2, w3, b3, wd, bd


def bench_stride1(name, b, h, w, cin, cmid, cout, ds, npi, logical_w=None,
                  iters=20):
    """One stride-1 case: Pallas vs XLA. logical_w -> carry mode (input is
    carried at padded width w with zero columns beyond logical_w)."""
    ws = _block_weights(cin, cmid, cout, ds)
    x = _mk((b, h, w, cin), 99)
    if logical_w is not None:
        mask = (np.arange(w) < logical_w)[None, None, :, None]
        x = x * jnp.asarray(mask, x.dtype)

    pallas_fn = jax.jit(lambda v: fused_bottleneck(
        v, *[a for a in ws[:6]], wd=ws[6], bd=ws[7],
        images_per_tile=npi, logical_w=logical_w))
    if logical_w is not None:
        def xla_fn_(v):
            vl = v[:, :, :logical_w, :]
            out = xla_bottleneck_reference(vl, *ws[:6], wd=ws[6], bd=ws[7])
            return jnp.pad(out, ((0, 0), (0, 0), (0, w - logical_w), (0, 0)))
        xla_fn = jax.jit(xla_fn_)
    else:
        xla_fn = jax.jit(lambda v: xla_bottleneck_reference(
            v, *ws[:6], wd=ws[6], bd=ws[7]))

    tp = _time(pallas_fn, x, iters=iters)
    tx = _time(xla_fn, x, iters=iters)
    ok = _spot_allclose(pallas_fn(x), xla_fn(x))
    print(f"{name:>14}  pallas {tp:8.2f} ms   xla {tx:8.2f} ms   "
          f"speedup {tx / tp:5.2f}x   allclose={ok}")
    return tp, tx


def _spot_allclose(a, b, n=65536):
    """allclose on a prefix slice — pulling full 56x56x256 batches over the
    tunneled device link takes minutes (full numerics live in
    tests/test_fused_block.py; this is a wiring sanity check)."""
    fa = jax.device_get(jax.jit(lambda v: v.ravel()[:n])(a))
    fb = jax.device_get(jax.jit(lambda v: v.ravel()[:n])(b))
    return bool(np.allclose(np.float32(fa), np.float32(fb),
                            atol=0.25, rtol=0.1))


def bench_stride2(name, b, h, w, cin, cmid, cout, npi, iters=20):
    ws = _block_weights(cin, cmid, cout, True)
    x = _mk((b, h, w, cin), 98)
    pallas_fn = jax.jit(lambda v: fused_bottleneck_s2(
        v, ws[0], ws[1], ws[2], ws[3], ws[4], ws[5], ws[6], ws[7],
        images_per_tile=npi))
    xla_fn = jax.jit(lambda v: xla_bottleneck_reference(
        v, *ws[:6], wd=ws[6], bd=ws[7], stride=2))
    tp = _time(pallas_fn, x, iters=iters)
    tx = _time(xla_fn, x, iters=iters)
    ok = _spot_allclose(pallas_fn(x), xla_fn(x))
    print(f"{name:>14}  pallas {tp:8.2f} ms   xla {tx:8.2f} ms   "
          f"speedup {tx / tp:5.2f}x   allclose={ok}")
    return tp, tx


CASES = {
    # layer1 body block (640 crops = batch 64 ten-crop), 56x56x256
    "layer1": lambda: bench_stride1("layer1", 640, 56, 56, 256, 64, 256,
                                    False, 1),
    # layer1 entry (downsample projection, stride 1 in resnet50 layer1)
    "layer1ds": lambda: bench_stride1("layer1ds", 640, 56, 56, 64, 64, 256,
                                      True, 1),
    # layer2 body in carry mode: 28 logical, carried at 32
    "layer2carry": lambda: bench_stride1("layer2carry", 640, 28, 32, 512,
                                         128, 512, False, 2, logical_w=28),
    # layer2 stage entry: stride-2 from 56x56x256 -> 28x28x512
    "layer2entry": lambda: bench_stride2("layer2entry", 640, 56, 56, 256,
                                         128, 512, 1),
    # layer3 stage entry: stride-2 from 28x28x512 -> 14x14x1024
    "layer3entry": lambda: bench_stride2("layer3entry", 640, 28, 32, 512,
                                         256, 1024, 2),
}

# images-per-tile sweep: probes per-grid-step overhead vs VMEM pressure
for _npi in (2, 4, 8):
    CASES[f"layer1npi{_npi}"] = (
        lambda n=_npi: bench_stride1(f"layer1npi{n}", 640, 56, 56, 256, 64,
                                     256, False, n))
    CASES[f"layer2npi{_npi}"] = (
        lambda n=_npi: bench_stride1(f"layer2npi{n}", 640, 28, 32, 512, 128,
                                     512, False, n, logical_w=28))


def bench_e2e(batch=64, iters=20):
    """Full flagship forward (ten-crop ingest -> ResNet50 -> heads -> f*)
    with the fused kernel enabled per-stage — the composition is what
    decides BENCH_FAST, not standalone block wins (XLA in-model blocks are
    ~2x faster than the standalone reference thanks to cross-block layout
    and fusion choices)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import REAL_CLASS_COUNTS, _synthetic_harrays
    from geoestimation_tpu.eval.infer import (
        mean_tta_logits,
        predict_hierarchical,
    )
    from geoestimation_tpu.ingest.pipeline import eval_pipeline
    from geoestimation_tpu.models import MultiPartitioningClassifier
    from geoestimation_tpu.models.fast_infer import build_fast_apply

    n_crops = 10
    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch="resnet50", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False)
    harrays = _synthetic_harrays(REAL_CLASS_COUNTS)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 256, 256, 3), dtype=np.uint8))

    def wrap(body):
        # `body` takes (weights_pytree, crops); weights ride as jit args so
        # the HLO shipped to the tunnel's remote-compile service stays
        # small (inlined 25M-param constants exceed its request limit).
        @jax.jit
        def fwd(wts, images_u8):
            x = eval_pipeline(images_u8, n_crops=n_crops, crop=224,
                              dtype=jnp.bfloat16)
            logits = body(wts, x)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)
        return fwd

    variants = [("flax", variables,
                 wrap(lambda wts, x: model.apply(wts, x, train=False)))]
    for name, stages in [("fast-noPallas", {}), ("fast-L1", {0: 1}),
                         ("fast-L2", {1: 2}), ("fast-L1L2", {0: 1, 1: 2})]:
        fa = build_fast_apply(variables, "resnet50",
                              n_classes=REAL_CLASS_COUNTS,
                              use_pallas=bool(stages),
                              pallas_stages=stages)
        variants.append((name, (), wrap(lambda wts, x, fa=fa: fa(x))))

    # mirror TTA: five-crop x {net, mirrored net} — takes the uint8 base
    # batch directly, so it wraps its own ingest
    from geoestimation_tpu.models.fast_infer import build_mirror_tta_apply

    for name, stages in [("mirror-noPallas", {}), ("mirror-L2", {1: 2})]:
        mt = build_mirror_tta_apply(
            variables, "resnet50", n_classes=REAL_CLASS_COUNTS,
            use_pallas=bool(stages), pallas_stages=stages)

        @jax.jit
        def mfwd(wts, images_u8, mt=mt):
            logits = mt(images_u8)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)

        variants.append((name, (), mfwd))

    for name, wts, fwd in variants:
        ms = _time(fwd, wts, images, iters=iters)
        ips = batch / (ms / 1e3)
        print(f"{name:>14}  {ms:8.2f} ms/step  {ips:8.1f} img/s", flush=True)


def main(argv):
    names = argv or [k for k in CASES]
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    for n in names:
        if n == "e2e":
            bench_e2e()
        else:
            CASES[n]()


if __name__ == "__main__":
    main(sys.argv[1:])
