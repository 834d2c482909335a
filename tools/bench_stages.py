"""Per-stage in-model timing by cumulative prefix slicing.

Times jitted prefixes of the backbone (ingest, +stem, +layer1, ..., +head)
and reports the deltas — the in-context cost each stage, which is what a
kernel must actually beat. Standalone block A/Bs overstate XLA's cost:
inside a jit XLA picks layouts/fusions across block boundaries that a
standalone reference (or a pallas_call boundary) forfeits.

The fast-infer path with pallas disabled times identically to the flax
model (61.1 vs 61.0 ms/step, tools/bench_kernels.py e2e), so its stage_fns
are a faithful proxy with clean cut points.

Usage: python tools/bench_stages.py [variant ...]
Variants: noPallas L1 L2 L1L2 (default: noPallas L2)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from __graft_entry__ import REAL_CLASS_COUNTS  # noqa: E402
from geoestimation_tpu.ingest.pipeline import eval_pipeline  # noqa: E402
from geoestimation_tpu.models import MultiPartitioningClassifier  # noqa: E402
from geoestimation_tpu.models.fast_infer import build_fast_apply  # noqa: E402

VARIANTS = {"noPallas": {}, "L1": {0: 1}, "L2": {1: 2}, "L1L2": {0: 1, 1: 2}}


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv):
    which = argv or ["noPallas", "L2"]
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    n_crops = 10
    print(f"backend={jax.default_backend()} batch={batch}")

    model = MultiPartitioningClassifier(
        n_classes=REAL_CLASS_COUNTS, arch="resnet50", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 256, 256, 3), dtype=np.uint8))

    names = ["ingest", "stem", "layer1", "layer2", "layer3", "layer4",
             "head"]
    for vname in which:
        fa = build_fast_apply(
            variables, "resnet50", n_classes=REAL_CLASS_COUNTS,
            use_pallas=bool(VARIANTS[vname]),
            pallas_stages=VARIANTS[vname])
        stage_fns = fa.stage_fns

        def prefix(k):
            # k = number of backbone stage_fns included (0 = ingest only);
            # k = len+1 = full apply incl. head
            @jax.jit
            def run(im):
                x = eval_pipeline(im, n_crops=n_crops, crop=224,
                                  dtype=jnp.bfloat16)
                if k > len(stage_fns):
                    return fa(x)
                for fn in stage_fns[:k]:
                    x = fn(x)
                # tiny reduction so dead-code elimination can't drop work
                return jnp.sum(x[..., :1].astype(jnp.float32))
            return run

        prev = 0.0
        print(f"--- variant {vname} ---")
        for k in range(len(stage_fns) + 2):
            ms = _time(prefix(k), images)
            print(f"{names[k] if k <= len(stage_fns) else 'head':>8}"
                  f"  cum {ms:7.2f} ms   delta {ms - prev:7.2f} ms",
                  flush=True)
            prev = ms


if __name__ == "__main__":
    main(sys.argv[1:])
