"""Training-step roofline: measured vs ideal, plus the mesh collective
audit (round-5, VERDICT #4).

Three measurements in one tool:

1. **Measured step time** — the real jitted train step (augment -> bf16
   forward -> sum-CE -> backward -> SGD, donated buffers) timed on the
   attached device at the requested batch, like tools/bench_train.py.
2. **Ideal step time** — from the compiled executable's own
   `cost_analysis()` (XLA's FLOP and bytes-accessed counts for exactly
   this HLO, not a hand model): compute-bound bound = flops / peak_flops,
   bandwidth-bound bound = bytes / peak_bw, ideal = max of the two.
   Peaks default to v5e (197 TFLOPS bf16, 819 GB/s HBM).
3. **Collective audit on the 8-device mesh** — the train step lowered
   over a data-parallel mesh of N virtual CPU devices; every all-reduce
   in the optimized HLO is bucketed by payload bytes. This separates the
   gradient psum (the ~25.6M-param reduction data-parallel training
   requires) from the global-batch BatchNorm statistic reductions
   (README "TPU design notes": BN under GSPMD reduces across shards
   inside the step), and quantifies the BN cost as bytes on the wire —
   the per-step ICI traffic story of docs/MULTIHOST.md.

Usage:
  python tools/train_roofline.py --batch 256           # on hardware
  python tools/train_roofline.py --collectives 8       # CPU mesh audit
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def build_step(batch, arch, remat, crop=224, base=256, n_devices=None):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import REAL_CLASS_COUNTS
    from geoestimation_tpu.models import MultiPartitioningClassifier
    from geoestimation_tpu.parallel.mesh import make_mesh
    from geoestimation_tpu.train.step import (
        create_train_state,
        make_jitted_train_step,
    )

    layout = (make_mesh() if n_devices is None
              else make_mesh(n_devices, 1,
                             devices=jax.devices()[:n_devices]))
    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch=arch, dtype=jnp.bfloat16,
        remat=remat)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 3)), train=False)
    tx = optax.sgd(0.01, momentum=0.9)
    state = create_train_state(model, variables, tx)
    state = state.replace(
        params=jax.device_put(state.params, layout.params(state.params)),
        batch_stats=jax.device_put(
            state.batch_stats,
            jax.tree.map(lambda _: layout.replicated(),
                         state.batch_stats)),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree.map(lambda _: layout.replicated(), state.opt_state)),
        step=jax.device_put(state.step, layout.replicated()),
    )
    step_fn = make_jitted_train_step(layout, crop=crop)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (batch, base, base, 3), dtype=np.uint8),
        layout.batch())
    labels = jax.device_put(
        np.stack([rng.integers(0, n, batch)
                  for n in REAL_CLASS_COUNTS]).astype(np.int32),
        layout.labels())
    key = jax.device_put(jax.random.PRNGKey(0), layout.replicated())
    return step_fn, state, images, labels, key


def roofline(args):
    import jax

    step_fn, state, images, labels, key = build_step(
        args.batch, args.arch, args.remat)
    lowered = step_fn.lower(state, images, labels, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))

    # measured (donated buffers: state flows through)
    state, metrics = step_fn(state, images, labels, key)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, images, labels, key)
    jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    t_compute = flops / args.peak_flops
    t_hbm = bytes_accessed / args.peak_bw
    ideal = max(t_compute, t_hbm)
    out = {
        "metric": f"train_roofline_{args.arch}"
                  + ("_remat" if args.remat else ""),
        "batch": args.batch,
        "measured_ms": round(dt * 1e3, 2),
        "images_per_sec_per_chip": round(
            args.batch / dt / jax.device_count(), 1),
        "xla_flops": flops,
        "xla_bytes_accessed": bytes_accessed,
        "ideal_compute_ms": round(t_compute * 1e3, 2),
        "ideal_hbm_ms": round(t_hbm * 1e3, 2),
        "ideal_ms": round(ideal * 1e3, 2),
        "bound_by": "compute" if t_compute >= t_hbm else "hbm",
        "measured_over_ideal": round(dt / ideal, 3) if ideal else None,
        "platform": jax.default_backend(),
    }
    print(json.dumps(out))
    return out


def collectives(args):
    # force the virtual CPU mesh BEFORE jax initializes a backend
    from __graft_entry__ import _force_cpu_mesh

    _force_cpu_mesh(args.collectives)

    step_fn, state, images, labels, key = build_step(
        args.batch, args.arch, args.remat, crop=args.cpu_crop,
        base=args.cpu_crop + 8, n_devices=args.collectives)
    hlo = step_fn.lower(state, images, labels, key).compile().as_text()

    # payload of every all-reduce op: `%all-reduce.N = (f32[64]{0}, ...)
    # all-reduce(...)` — shapes sit between '=' and 'all-reduce('.
    # Bucketing uses the op metadata XLA carries: BN statistic reduces
    # are tagged with their module scope (`.../bn1/reduce_sum`,
    # `.../layerK_blockB/bnX/...`); everything >= 256 KB is the
    # gradient psum (fused whole-parameter payloads); the rest are
    # loss/metric scalars and small fusions.
    sizes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
             "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8}
    buckets = {"bn_stats": {"n": 0, "bytes": 0},
               "grad_psum": {"n": 0, "bytes": 0},
               "other_small": {"n": 0, "bytes": 0}}
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    for ln in hlo.splitlines():
        m = re.search(r"= (.*?) all-reduce\(", ln)
        if m is None:
            continue
        total_bytes = 0
        for sm in shape_pat.finditer(m.group(1)):
            dt_, dims = sm.group(1), sm.group(2)
            n_elem = (int(np.prod([int(d) for d in dims.split(",")]))
                      if dims else 1)
            total_bytes += n_elem * sizes.get(dt_, 4)
        # size check FIRST: a fused >=256 KB payload is the gradient
        # psum even when its combiner metadata points at a bn op (BN
        # gamma/beta grads ride the fused gradient reduction). The bn
        # pattern must also catch the projection shortcut's
        # 'downsample_bn' scope, hence no leading slash anchor.
        if total_bytes >= 1 << 18:
            b = buckets["grad_psum"]
        elif re.search(r"/\w*bn\w*/", ln):
            b = buckets["bn_stats"]
        else:
            b = buckets["other_small"]
        b["n"] += 1
        b["bytes"] += total_bytes
    out = {
        "metric": f"train_step_collectives_{args.arch}",
        "mesh_devices": args.collectives,
        "batch": args.batch,
        "buckets": buckets,
        "bn_share_of_collective_bytes": round(
            buckets["bn_stats"]["bytes"]
            / max(1, sum(v["bytes"] for v in buckets.values())), 6),
    }
    print(json.dumps(out, indent=1))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--peak_flops", type=float, default=V5E_PEAK_BF16_FLOPS)
    p.add_argument("--peak_bw", type=float, default=V5E_PEAK_HBM_BPS)
    p.add_argument("--collectives", type=int, default=0,
                   help="N: skip the hardware roofline and audit the "
                        "all-reduces of the step lowered over an "
                        "N-device virtual CPU mesh")
    p.add_argument("--cpu_crop", type=int, default=64,
                   help="crop for the CPU collective audit (the "
                        "collective STRUCTURE is crop-invariant; small "
                        "crops keep the CPU compile fast — BN payloads "
                        "are per-channel, not per-pixel)")
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    if args.collectives:
        return collectives(args)
    return roofline(args)


if __name__ == "__main__":
    main()
