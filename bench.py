"""Benchmark: ten-crop inference images/sec/chip for the flagship model.

Metric (BASELINE.json): "ten-crop images/sec/chip (ResNet50)". Target:
>= 10k ten-crop images/sec on a v5e-8, i.e. >= 1250 per chip; vs_baseline
is measured-per-chip / 1250.

Measures the full device-side path: uint8 (B, 256, 256, 3) -> XLA ten-crop
+ normalize -> ResNet50 bf16 -> 3 heads (real class counts) -> TTA fold ->
hierarchical f* argmax + lat/lng gather. Host ingest is excluded by design:
the pipeline overlaps host decode with device compute, and the chip is the
bottleneck at speed-of-light.

Robustness contract (round-2): this script ALWAYS prints exactly one JSON
line with {"metric", "value", "unit", "vs_baseline"} (plus "platform" and,
on any fallback/failure, "error"). The TPU tunnel in this environment dies
unpredictably (round-1 BENCH captured nothing, rc=1), so:
  * the tunnel relay port is probed cheaply before touching the jax axon
    backend (a dead relay otherwise hangs backend init);
  * TPU init is retried with backoff (BENCH_TPU_RETRIES / _BACKOFF_S);
  * if the TPU never comes up and BENCH_ALLOW_CPU != "0" (default: allowed)
    the bench runs a reduced-size CPU measurement, clearly labeled
    platform=cpu-fallback, rather than emitting nothing;
  * a total failure still emits a JSON line with value=null and exits 1.
"""

import json
import os
import socket
import sys
import time
import traceback

import numpy as np

TARGET_PER_CHIP = 1250.0  # 10k ten-crop img/s on a v5e-8
RELAY_PORTS = (8082, 8083, 8087)  # axon relay listen ports (loopback)


def _relay_up(timeout=2.0) -> bool:
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout):
                return True
        except OSError:
            continue
    return False


def _emit(result: dict) -> None:
    print(json.dumps(result))
    sys.stdout.flush()


def _setup_jax_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def _init_tpu(errors: list) -> bool:
    """Bring up the axon TPU backend, with bounded retries. Returns True on
    success; collects error strings otherwise."""
    retries = int(os.environ.get("BENCH_TPU_RETRIES", "3"))
    backoff = float(os.environ.get("BENCH_TPU_BACKOFF_S", "5"))
    import jax

    for attempt in range(retries):
        if attempt:
            time.sleep(backoff * attempt)
        if not _relay_up():
            errors.append(f"attempt {attempt + 1}: relay ports "
                          f"{RELAY_PORTS} not listening")
            continue
        try:
            devs = jax.devices()
            if devs and devs[0].platform != "cpu":
                return True
            errors.append(
                f"attempt {attempt + 1}: devices are {devs}"
            )
        except Exception as e:  # noqa: BLE001 - report, retry
            errors.append(
                f"attempt {attempt + 1}: {type(e).__name__}: {e}"
            )
            try:
                import jax.extend as jex

                jex.backend.clear_backends()
            except Exception:
                pass
    return False


def _force_cpu():
    import jax

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if jax.default_backend() != "cpu":
        import jax.extend as jex

        jex.backend.clear_backends()


def _measure(batch: int, iters: int) -> float:
    """Returns ten-crop images/sec/chip on whatever backend jax has."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import REAL_CLASS_COUNTS, _synthetic_harrays
    from geoestimation_tpu.eval.infer import (
        mean_tta_logits,
        predict_hierarchical,
    )
    from geoestimation_tpu.ingest.pipeline import eval_pipeline
    from geoestimation_tpu.models import MultiPartitioningClassifier

    n_crops = 10
    # BENCH_ARCH: resnet50 (the headline metric) or resnet101 (the legacy
    # paper config). Arch-specific scales caches and A/B notes all key off
    # this; the metric name carries the arch so numbers are never conflated.
    arch = os.environ.get("BENCH_ARCH", "resnet50")
    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch=arch, dtype=jnp.bfloat16
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    harrays = _synthetic_harrays(REAL_CLASS_COUNTS)

    # BENCH_PRECISION selects the serving path (default int8 — the
    # production serving precision, models/quant.py):
    #   int8: folded-BN + normalize-in-stem PTQ, s8 x s8 -> s32 convs.
    #         Measured 43.4 ms/step = 1474 img/s/chip on v5e (1.35x bf16)
    #         with 100% hierarchy-argmax agreement vs bf16 on the bench
    #         inputs (docs/PERF_NOTES.md round 2; accuracy evidence in
    #         tests/test_quant.py, tests/test_e2e_inference.py).
    #   bf16: the exact-precision path (reference --precision 16 analog).
    # Activation scales for the (deterministic, seed-0) bench model ship
    # in tools/bench_int8_scales.json so the bench never pays the fp32
    # calibration compile; if absent/mismatched it recalibrates.
    import jax

    precision = os.environ.get("BENCH_PRECISION", "int8")
    if jax.default_backend() == "cpu" and precision == "int8":
        # XLA:CPU has no vectorized s8 conv path — int8 runs minutes per
        # step there. The CPU fallback exists to prove liveness when the
        # TPU tunnel is dead, so measure the bf16 path instead.
        precision = "bf16"
        os.environ["BENCH_PRECISION"] = "bf16-cpu-fallback"
    if precision == "int8":
        from geoestimation_tpu.models.quant import (
            build_int8_apply,
            calibrate,
            pack_scales,
            quantize_model,
            unpack_scales,
            weights_hash,
        )
        from geoestimation_tpu.ingest.pipeline import eval_pipeline_s8

        qnet = quantize_model(variables, arch=arch)
        qhash = weights_hash(qnet)
        scales_name = ("bench_int8_scales.json" if arch == "resnet50"
                       else f"bench_int8_scales_{arch}.json")
        scales_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools", scales_name)
        scales = None
        if os.path.exists(scales_path):
            try:
                with open(scales_path) as f:
                    obj = json.load(f)
            except (json.JSONDecodeError, OSError):
                obj = None
            if obj is not None:
                # hash-checked: any change to the bench model generation
                # recalibrates instead of silently reusing stale scales
                scales, _why = unpack_scales(obj, arch,
                                             expect_hash=qhash)
        if not scales:
            calib = np.random.default_rng(123).integers(
                0, 255, (8, 256, 256, 3), dtype=np.uint8)
            scales = calibrate(variables, [calib], arch=arch,
                               n_crops=n_crops, crop=224)
            try:  # best-effort refresh so the next run skips calibration
                tmp = f"{scales_path}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(pack_scales(
                        scales, weights_hash=qhash, source="synthetic",
                        n_images=8), f, indent=1, sort_keys=True)
                os.replace(tmp, scales_path)
            except OSError:
                pass
        if os.environ.get("BENCH_UNIFY_SCALES", "0") == "1":
            # A/B lever: stage-unified residual scales make identity
            # residual multipliers exactly 1.0 (XLA folds them away)
            from geoestimation_tpu.models.quant import (
                unify_stage_out_scales,
            )
            from geoestimation_tpu.models.resnet import STAGE_SIZES

            scales = unify_stage_out_scales(scales,
                                            STAGE_SIZES[arch])
        # BENCH_TTA=feature: feature-space ten-crop TTA (trunk once per
        # base image + mirror, crops at the layer3 feature map —
        # models/quant.py feature_tta docs; accuracy evidence:
        # docs/QUANTIZATION.md study table).
        feature_tta = os.environ.get("BENCH_TTA", "exact") == "feature"
        ftta_level = int(os.environ.get("BENCH_TTA_LEVEL", "3"))
        int8_apply = build_int8_apply(
            qnet, scales, n_classes=REAL_CLASS_COUNTS,
            feature_tta=({"crop": 224, "n_crops": n_crops,
                          "level": ftta_level}
                         if feature_tta else None))

        # NOTE: weights ride as jit closure constants (no variables arg) so
        # the compiled graph matches the A/B harness's cache entries.
        @jax.jit
        def forward_i8(images_u8):
            if feature_tta:
                from geoestimation_tpu.models.quant import shift_s8

                x = shift_s8(images_u8)
            else:
                x = eval_pipeline_s8(images_u8, n_crops=n_crops, crop=224)
            logits = int8_apply(x)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)

        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
        )
        out = forward_i8(images)
        jax.device_get(jax.tree.leaves(out)[0][:1])
        out = forward_i8(images)
        jax.device_get(jax.tree.leaves(out)[0][:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward_i8(images)
        jax.device_get(jax.tree.leaves(out)[0][:1])
        dt = time.perf_counter() - t0
        return batch * iters / dt / jax.device_count()

    # BENCH_FAST=1 (with BENCH_PRECISION=bf16): folded-BN XLA path — the
    # fastest EXACT-precision config (58.5 ms vs flax 58.7 at batch 64).
    # Pallas bottleneck kernels stay off: hardware A/B shows XLA's conv
    # emitter wins end to end (docs/PERF_NOTES.md round 2).
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    if os.environ.get("BENCH_TTA", "exact") == "feature":
        from geoestimation_tpu.ingest.pipeline import normalize
        from geoestimation_tpu.models.fast_infer import (
            build_feature_tta_apply,
        )

        ftta_apply = build_feature_tta_apply(
            variables, arch, n_classes=REAL_CLASS_COUNTS,
            n_crops=n_crops,
            level=int(os.environ.get("BENCH_TTA_LEVEL", "3")))

        @jax.jit
        def forward(variables, images_u8):
            logits = ftta_apply(normalize(images_u8, jnp.bfloat16))
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)
    elif fast:
        from geoestimation_tpu.models.fast_infer import build_fast_apply

        fast_apply = build_fast_apply(
            variables, arch, n_classes=REAL_CLASS_COUNTS,
            use_pallas=os.environ.get("BENCH_PALLAS", "0") == "1",
        )

        @jax.jit
        def forward(variables, images_u8):
            x = eval_pipeline(images_u8, n_crops=n_crops, crop=224,
                              dtype=jnp.bfloat16)
            logits = fast_apply(x)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)
    else:
        @jax.jit
        def forward(variables, images_u8):
            x = eval_pipeline(images_u8, n_crops=n_crops, crop=224,
                              dtype=jnp.bfloat16)
            logits = model.apply(variables, x, train=False)
            logits = [mean_tta_logits(l, n_crops) for l in logits]
            return predict_hierarchical(logits, harrays)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 256, 256, 3), dtype=np.uint8)
    )

    # Warmup / compile. Use device_get (scalar readback) as the fence:
    # on the tunneled axon platform block_until_ready can return before
    # device completion; a readback cannot. Its RTT is amortized over
    # `iters` in the timed section.
    out = forward(variables, images)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    out = forward(variables, images)
    jax.device_get(jax.tree.leaves(out)[0][:1])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, images)
    jax.device_get(jax.tree.leaves(out)[0][:1])
    dt = time.perf_counter() - t0

    return batch * iters / dt / jax.device_count()


def _metric_name() -> str:
    arch = os.environ.get("BENCH_ARCH", "resnet50")
    return f"ten_crop_images_per_sec_per_chip_{arch}"


def main():
    errors: list = []
    platform = "tpu"
    try:
        import jax  # noqa: F401
    except Exception as e:  # jax import itself broken
        _emit({
            "metric": _metric_name(),
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "platform": "none",
            "error": f"jax unavailable: {type(e).__name__}: {e}",
        })
        return 1

    force_cpu = os.environ.get("BENCH_FORCE_CPU", "0") == "1"
    if force_cpu:
        errors.append("BENCH_FORCE_CPU=1")
    if not force_cpu and _init_tpu(errors):
        # Persistent cache only on the TPU path: CPU-fallback runs must not
        # load cache entries AOT-compiled for a different host CPU (SIGILL
        # risk), and caching a one-off fallback has no value anyway.
        _setup_jax_cache()
    else:
        if os.environ.get("BENCH_ALLOW_CPU", "1") == "0":
            _emit({
                "metric": _metric_name(),
                "value": None, "unit": "images/sec/chip",
                "vs_baseline": None, "platform": "none",
                "error": "TPU unavailable: " + " | ".join(errors),
            })
            return 1
        platform = "cpu-fallback"
        try:
            _force_cpu()
        except Exception:
            errors.append(traceback.format_exc(limit=2))

    if platform == "cpu-fallback":
        batch = int(os.environ.get("BENCH_BATCH", "4"))
        iters = int(os.environ.get("BENCH_ITERS", "3"))
    else:
        # int8 batch sweep (round 3, repeatable): 80:1468 96:1507-1508
        # 104:1455 112:1522-1523 120:1451 128:1479 — b=112 is the peak
        # (+1.0% over 96); bf16 is batch-flat at 64/96 and worse at 112,
        # so only the int8 default moves. Re-swept round 4 under the
        # half-up requant default (96:1720 112:1712 120:1630 128:1687):
        # same 96-112 plateau and 120 dip — the optimum did not move.
        default_b = "112" if os.environ.get(
            "BENCH_PRECISION", "int8") == "int8" else "64"
        batch = int(os.environ.get("BENCH_BATCH", default_b))
        iters = int(os.environ.get("BENCH_ITERS", "30"))

    try:
        per_chip = _measure(batch, iters)
    except Exception as e:  # noqa: BLE001 - always emit an artifact
        errors.append(f"measure: {type(e).__name__}: {e}")
        _emit({
            "metric": _metric_name(),
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "platform": platform,
            "error": " | ".join(errors),
        })
        return 1

    result = {
        "metric": _metric_name(),
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / TARGET_PER_CHIP, 4),
        "platform": platform,
        "precision": os.environ.get("BENCH_PRECISION", "int8"),
        "tta": os.environ.get("BENCH_TTA", "exact"),
    }
    if errors:
        result["error"] = " | ".join(errors)
    _emit(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
