"""Training-step throughput micro-benchmark (secondary; not the driver
metric — that is bench.py's ten-crop inference number).

Measures images/sec/chip for the full jitted train step (augment ->
bf16 forward -> sum-of-CE -> backward -> SGD update, donated buffers) at
the real class counts, synthetic data resident on device.

Usage: python tools/bench_train.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--arch", default="resnet50")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import REAL_CLASS_COUNTS
    from geoestimation_tpu.models import MultiPartitioningClassifier
    from geoestimation_tpu.parallel.mesh import make_mesh
    from geoestimation_tpu.train.step import (
        create_train_state,
        make_jitted_train_step,
    )

    layout = make_mesh()
    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch=args.arch, dtype=jnp.bfloat16,
        remat=args.remat,
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)), train=False)
    tx = optax.sgd(0.01, momentum=0.9)
    state = create_train_state(model, variables, tx)
    state = state.replace(
        params=jax.device_put(state.params, layout.params(state.params)),
        batch_stats=jax.device_put(
            state.batch_stats,
            jax.tree.map(lambda _: layout.replicated(), state.batch_stats),
        ),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree.map(lambda _: layout.replicated(), state.opt_state),
        ),
        step=jax.device_put(state.step, layout.replicated()),
    )
    step_fn = make_jitted_train_step(layout, crop=224)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(0, 255, (args.batch, 256, 256, 3), dtype=np.uint8),
        layout.batch(),
    )
    labels = jax.device_put(
        np.stack([rng.integers(0, n, args.batch)
                  for n in REAL_CLASS_COUNTS]).astype(np.int32),
        layout.labels(),
    )
    key = jax.device_put(jax.random.PRNGKey(0), layout.replicated())

    state, metrics = step_fn(state, images, labels, key)
    jax.device_get(metrics["loss"])  # fence
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step_fn(state, images, labels, key)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0
    ips = args.batch * args.iters / dt / jax.device_count()
    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_{args.arch}"
                  + ("_remat" if args.remat else ""),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
