"""Batched inference engine: images -> per-partitioning + f* predictions.

This is the device half of the reference's `classification/inference.py` /
`classification/test.py` call stack (SURVEY.md §4.2/4.3): one jitted
function takes the uint8 host batch and returns predicted classes and
coordinates for every partitioning key plus 'hierarchy'. The TTA crop axis
is folded into batch; logits are averaged in log space over crops; all
gathers/argmaxes run on device. Only tiny int/float vectors return to host.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..geo import Hierarchy, load_partitionings
from ..ingest import eval_pipeline
from ..models import MultiPartitioningClassifier
from .infer import HierarchyArrays, mean_tta_logits, predict_all
from .metrics import DEFAULT_THRESHOLDS_KM, GcdAccumulator, gcd_threshold_counts


def resolve_partitioning_paths(files: Sequence[str],
                               search_dirs: Sequence[str]) -> list:
    """Resolve config-relative partitioning CSV paths against search dirs
    (cwd, checkpoint dir, repo root)."""
    out = []
    for f in files:
        if os.path.isabs(f) and os.path.exists(f):
            out.append(f)
            continue
        for d in ["", *search_dirs]:
            cand = os.path.join(d, f) if d else f
            if os.path.exists(cand):
                out.append(cand)
                break
        else:
            raise FileNotFoundError(
                f"partitioning file {f!r} not found in {list(search_dirs)}"
            )
    return out


def default_scales_path(checkpoint: str) -> str:
    """Conventional location for cached int8 activation scales: next to
    the checkpoint (`<ckpt_dir>/int8_scales.json`)."""
    d = checkpoint if os.path.isdir(checkpoint) else os.path.dirname(
        os.path.abspath(checkpoint))
    return os.path.join(d, "int8_scales.json")


class InferenceEngine:
    def __init__(
        self,
        config,
        state: dict,
        partitionings=None,
        n_crops: int = 10,
        crop: int = 224,
        dtype=jnp.bfloat16,
        search_dirs: Sequence[str] = (),
        fast: bool = False,
        use_pallas: bool = False,
        layout=None,
        tta_mode: str = "device",
        tta_fold: str = "prob_mean",
        feature_tta_level: int = 3,
        int8: bool = False,
        int8_scales_path: Optional[str] = None,
        calib_dir: Optional[str] = None,
        calib_images: int = 64,
        calib_stat: str = "auto",
        calib_headroom: float = 1.0,
        int8_persist: bool = True,
        int8_recalibrate: bool = False,
        fast_decode: bool = False,
    ):
        """fast=True folds BatchNorm into conv weights at load time
        (models/fast_infer.py) — identical predictions up to bf16 rounding;
        use_pallas additionally routes stride-1 bottlenecks through the
        fused kernel (base classifier only). layout: optional
        parallel.MeshLayout — eval batches shard over its data axis (the
        TTA crop axis folds into batch and shards with it).
        tta_mode: 'device' (default — crops from a 256 square inside jit)
        or 'host_exact' (torchvision-exact host ten-crop geometry for
        strict parity on non-square images; forces n_crops=10), or
        'feature' (approximate fast mode: crops taken at the
        layer{feature_tta_level} feature map — models/fast_infer.py
        build_feature_tta_apply; level 3 is the fastest and the only
        recommended setting — level 2 measured no closer to exact,
        see docs/QUANTIZATION.md).
        tta_fold: how per-crop logits combine — 'prob_mean' (reference
        convention, default), 'log_mean', or 'logit_mean'
        (eval.infer.mean_tta_logits).
        int8: TPU serving precision (models/quant.py) — post-training
        int8 quantization; ~1.3-1.4x measured over bf16 on v5e. The
        reference's precision surface stops at fp16 (README.md:159-160);
        int8 is the beyond-parity option. Calibration source, in
        priority order: `calib_dir` (deterministic: first `calib_images`
        images of the dir in sorted order — ALWAYS recalibrates,
        ignoring any cache), else a valid scales cache at
        `int8_scales_path`, else the first eval batch (standard
        unlabeled-domain-data PTQ — depends on directory order; pass
        calib_dir for reproducible reported tables).
        int8_scales_path: optional JSON cache for activation scales
        (v2 provenance format, models/quant.py:pack_scales). A cached
        file is trusted only if its weights hash matches the loaded
        checkpoint's quantized weights — swapping/fine-tuning a
        checkpoint in the same directory recalibrates instead of
        silently reusing stale scales. After calibration the cache is
        written back unless int8_persist=False or the source was fewer
        than MIN_DISTINCT_FOR_PERSIST (6) distinct images (e.g. a
        padded single-image serving batch).
        calib_stat: 'auto' (default) | 'absmax' | 'p999' | 'p9999'.
        'auto' derives all three candidate scales from ONE sampling
        pass and ships the one whose int8 forward best matches the
        fp32 forward on the calibration images (quant.autoselect_scales
        — the round-4 studies measured the stat ranking inverting
        between corpora, so no fixed stat is safe out of the box);
        the picked stat is recorded as 'auto:<picked>' in the scales
        provenance. A fixed stat forces that grid point
        (quant.calibrate).
        calib_headroom: scale multiplier (>1 trades resolution for
        clipping margin); int8_recalibrate: ignore any cache.
        fast_decode: scaled DCT JPEG decode on the host ingest path
        (ingest.decode — several times faster on large photos, slightly
        different pixels); also applies to int8 calibration batches so
        calibration sees the same pixel distribution as eval."""
        mp = config.model_params
        if partitionings is None:
            paths = resolve_partitioning_paths(
                mp.partitionings.files, search_dirs
            )
            partitionings = load_partitionings(
                paths, names=list(mp.partitionings.shortnames)
            )
        self.partitionings = partitionings
        self.hierarchy = Hierarchy.build(partitionings)
        self.harrays = HierarchyArrays.from_hierarchy(self.hierarchy)
        self.n_crops = n_crops
        self.crop = crop
        # Build from config so ISN checkpoints route through their scene
        # gate transparently (ISNClassifier shares the __call__ contract).
        import dataclasses as _dc

        from ..train.init import model_from_config

        self.model = _dc.replace(
            model_from_config(config, partitionings), dtype=dtype
        )
        self.variables = {
            "params": state["params"],
            "batch_stats": state["batch_stats"],
        }
        self._int8 = int8
        self._int8_scales_path = int8_scales_path
        self._calib_dir = calib_dir
        self._calib_images = calib_images
        self._calib_stat = calib_stat
        self._calib_headroom = calib_headroom
        self._int8_persist = int8_persist
        self._int8_recalibrate = int8_recalibrate
        self._fast_decode = fast_decode
        self._feature_tta_level = feature_tta_level
        self.model_arch = mp.arch
        self._int8_apply = None  # built lazily after first-batch calib
        if int8:
            from ..models.quant import quantize_model, weights_hash

            self._qnet = quantize_model(self.variables, mp.arch)
            self._qhash = weights_hash(self._qnet)
            self._n_classes = tuple(len(p) for p in partitionings)
        if tta_mode not in ("device", "host_exact", "feature"):
            raise ValueError(f"unknown tta_mode {tta_mode!r}")
        if tta_mode == "feature" and n_crops not in (5, 10):
            raise ValueError("feature TTA supports 5 or 10 crops")
        self._fast_apply = None
        self._feature_apply = None
        if tta_mode == "feature" and not int8:
            # bf16 feature TTA rides the folded-BN stage structure
            # (supersedes `fast` — it is the folded path plus the
            # feature-crop trick). The folded network computes in bf16;
            # refuse a float32 request instead of silently downgrading.
            if dtype != jnp.bfloat16:
                raise ValueError(
                    "feature TTA runs the bf16 folded-BN network; "
                    "--precision 32 is not available in this mode "
                    "(use --precision 16, or drop --feature_tta)")
            from ..models.fast_infer import build_feature_tta_apply

            self._feature_apply = build_feature_tta_apply(
                self.variables, mp.arch,
                n_classes=tuple(len(p) for p in partitionings),
                use_pallas=use_pallas,
                crop=crop, n_crops=n_crops, level=feature_tta_level)
        elif fast and not int8:
            # int8 and feature modes never call _fast_apply — skip the
            # load-time BN fold instead of holding a dead pytree.
            # The fold computes in bf16; refuse a float32 request the
            # same way feature TTA does instead of silently returning
            # bf16 results labeled fp32.
            if dtype != jnp.bfloat16:
                raise ValueError(
                    "--fast folds BatchNorm into bf16 conv weights; "
                    "--precision 32 is not available in this mode "
                    "(use --precision 16, or drop --fast)")
            from ..models.fast_infer import build_fast_apply

            self._fast_apply = build_fast_apply(
                self.variables, mp.arch,
                n_classes=tuple(len(p) for p in partitionings),
                use_pallas=use_pallas,
            )
        from .infer import TTA_FOLDS

        if tta_fold not in TTA_FOLDS:
            raise ValueError(
                f"unknown tta_fold {tta_fold!r}; have {TTA_FOLDS}"
            )
        self.tta_fold = tta_fold
        self.tta_mode = tta_mode
        if tta_mode == "host_exact":
            self.n_crops = n_crops = 10
        self.layout = layout
        if layout is not None:
            self.variables = jax.device_put(
                self.variables,
                jax.tree.map(lambda _: layout.replicated(), self.variables),
            )
        self._forward = jax.jit(
            functools.partial(self._forward_impl, n_crops=n_crops, crop=crop)
        )

    def _calib_dir_fingerprint(self):
        """Identity of the deterministic calibration set: sha256 over
        the (sorted) first `calib_images` filenames + sizes. Lets a
        cached scales file prove it was calibrated on exactly this set,
        so server restarts skip the multi-minute calibration compile
        while any change to the set (or the weights) recalibrates."""
        import hashlib

        from ..data.image_folder import list_images

        h = hashlib.sha256()
        for p in list_images(self._calib_dir)[:self._calib_images]:
            h.update(os.path.basename(p).encode())
            h.update(str(os.path.getsize(p)).encode())
        return h.hexdigest()[:16]

    def _calib_dir_batches(self):
        """Deterministic calibration stream: the first `calib_images`
        images of `calib_dir` in sorted-filename order, as uint8 base
        batches."""
        from ..data.image_folder import iter_image_folder

        batches, n = [], 0
        for fb in iter_image_folder(self._calib_dir, batch_size=32,
                                    fast_decode=self._fast_decode):
            good = fb.images[np.asarray(fb.valid)]
            take = min(self._calib_images - n, len(good))
            if take:
                batches.append(good[:take])
                n += take
            if n >= self._calib_images:
                break
        if n == 0:
            raise FileNotFoundError(
                f"calib_dir {self._calib_dir!r}: no decodable images")
        return batches, n

    def _stat_matches(self, prov_stat) -> bool:
        """True iff a cache's provenance stat satisfies the requested
        --calib_stat. 'auto' accepts any 'auto:<picked>' cache — the
        pick is a deterministic function of (weights, calibration set,
        headroom), all of which the surrounding provenance checks
        already pin."""
        if prov_stat == self._calib_stat:
            return True
        return (self._calib_stat == "auto" and isinstance(prov_stat, str)
                and prov_stat.startswith("auto:"))

    def _calibrate_batches(self, batches, n_crops=None):
        """Calibrate on uint8 base-image batches at the requested stat.

        Returns (scales, stat_for_provenance). 'auto' scores the
        candidate stats against the fp32 forward on the same images
        (quant.autoselect_scales) and returns the winner's scales with
        provenance stat 'auto:<picked>'."""
        if n_crops is None:
            n_crops = self.n_crops
        if self._calib_stat == "auto":
            from ..models.quant import autoselect_scales

            scales, picked, kls = autoselect_scales(
                self.variables, batches, self._qnet,
                arch=self.model_arch, n_classes=self._n_classes,
                n_crops=n_crops, crop=self.crop,
                headroom=self._calib_headroom)
            print("int8: auto calibration picked stat=" + picked
                  + " (parity-proxy KL "
                  + ", ".join(f"{s}={kls[s]:.5f}" for s in kls) + ")",
                  flush=True)
            return scales, f"auto:{picked}"
        from ..models.quant import calibrate

        scales = calibrate(self.variables, batches, self.model_arch,
                           n_crops=n_crops, crop=self.crop,
                           stat=self._calib_stat,
                           headroom=self._calib_headroom)
        return scales, self._calib_stat

    # Persist first-batch scales only when calibrated on a reasonably
    # varied sample: a serving micro-batch padded from one image (or a
    # tiny directory) must not bake its scales into the cache forever.
    # (A padded MicroBatcher batch repeats 1-2 real images; any real
    # eval directory provides more distinct images than this.)
    MIN_DISTINCT_FOR_PERSIST = 6

    def _build_int8(self, images_u8):
        """PTQ calibration + int8 forward build. Source priority:
        calib_dir (always recalibrates) > valid cache > first batch.
        Cache format + trust rules: models/quant.py pack/unpack_scales."""
        import json

        from ..models.quant import (
            build_int8_apply,
            pack_scales,
            unpack_scales,
        )

        scales = None
        source = None
        n_images = 0
        fingerprint = (self._calib_dir_fingerprint() if self._calib_dir
                       else None)
        path = self._int8_scales_path
        if (scales is None and path and os.path.exists(path)
                and not self._int8_recalibrate):
            # Trust the cache only after validation: a truncated write,
            # a different arch, an older (v1) format, or scales
            # calibrated for DIFFERENT weights in the same directory
            # must all trigger recalibration, not silent mis-scaling.
            obj = None
            try:
                with open(path) as f:
                    obj = json.load(f)
            except (json.JSONDecodeError, OSError):
                obj = None
            if obj is not None:
                scales, why = unpack_scales(obj, self.model_arch,
                                            expect_hash=self._qhash)
                if scales is not None:
                    # Pixel-pipeline provenance applies to EVERY cache
                    # read, not just --calib_dir: fast_decode / crop
                    # geometry change the activation distribution the
                    # scales were fit to, so a cache written under a
                    # different pipeline recalibrates even when the
                    # weights hash matches. Exception: 'qat'/'distill'
                    # scales are TRAINED-AGAINST — the quantized weights
                    # were optimized for exactly these values (tools/
                    # qat_finetune.py, tools/tta_distill.py), so
                    # recalibrating would silently discard the QAT/
                    # distillation result; they stay pinned on
                    # weights-hash alone.
                    prov = why  # unpack returns provenance on success
                    if prov.get("source") not in ("qat", "distill") \
                            and not (prov.get("fast_decode")
                                     == bool(self._fast_decode)
                                     and prov.get("crop") == self.crop
                                     and prov.get("n_crops")
                                     == self.n_crops):
                        scales, why = None, ("cache calibrated under a "
                                             "different pixel pipeline")
                if scales is not None:
                    # Calibration-settings provenance ALSO applies to
                    # every cache read (round-5 review fix): a cache
                    # recorded at a different stat/headroom must not
                    # silently satisfy an explicit --calib_stat (or the
                    # auto default) — otherwise the requested setting is
                    # inert on any deployment with a pre-existing cache.
                    # Same qat/distill exemption: trained-against scales
                    # stay pinned on weights-hash alone.
                    prov = why
                    if prov.get("source") not in ("qat", "distill") \
                            and not (self._stat_matches(prov.get("stat"))
                                     and prov.get("headroom")
                                     == self._calib_headroom):
                        scales, why = None, (
                            "cache calibrated at different settings "
                            f"(stat={prov.get('stat')!r}, headroom="
                            f"{prov.get('headroom')!r}; requested "
                            f"{self._calib_stat!r}@"
                            f"{self._calib_headroom!r})")
                if scales is not None and self._calib_dir:
                    # --calib_dir forces recalibration UNLESS the cache
                    # proves it was calibrated on exactly this set with
                    # these settings. 'qat'/'distill' scales stay pinned
                    # HERE TOO: recalibrating (and then persisting over
                    # int8_scales.json, the only copy of the trained
                    # scales) would silently discard the QAT/distillation
                    # result; --recalibrate is the explicit override.
                    prov = why
                    if prov.get("source") in ("qat", "distill"):
                        print("int8: keeping the checkpoint's trained "
                              f"{prov['source']} scales; --calib_dir is "
                              "ignored for trained-against scales (use "
                              "--recalibrate to override)", flush=True)
                    elif not (prov.get("source") == "calib_dir"
                              and prov.get("calib_fingerprint")
                              == fingerprint
                              and self._stat_matches(prov.get("stat"))
                              and prov.get("headroom")
                              == self._calib_headroom):
                        scales, why = None, ("cache not from this "
                                             "calibration set/settings")
                if scales is None:
                    print(f"int8: ignoring scales cache {path}: {why}",
                          flush=True)
                else:
                    source = "cache"
        stat_used = (why.get("stat") if source == "cache"
                     else self._calib_stat)
        if scales is None and self._calib_dir:
            batches, n_images = self._calib_dir_batches()
            scales, stat_used = self._calibrate_batches(batches)
            source = "calib_dir"
        if scales is None:
            arr = np.asarray(images_u8)
            # Distinct IMAGES, not crops: count over the leading axis of
            # the ORIGINAL array — a 5D host-precropped single image
            # yields 10 distinct crops but is still one image, and its
            # scales must not be persisted (MIN_DISTINCT_FOR_PERSIST).
            n_images = len({bytes(im.tobytes()) for im in arr})
            if arr.ndim == 5:
                arr = arr.reshape((-1,) + arr.shape[-3:])
                n_crops = 1
            else:
                n_crops = self.n_crops
            scales, stat_used = self._calibrate_batches([arr],
                                                        n_crops=n_crops)
            source = "first_batch"
        varied_enough = (source == "calib_dir"  # explicit user choice
                         or n_images >= self.MIN_DISTINCT_FOR_PERSIST)
        if (path and source != "cache" and self._int8_persist
                and varied_enough):
            try:
                with open(path) as f:
                    old_src = json.load(f).get("provenance",
                                               {}).get("source")
            except (OSError, json.JSONDecodeError, AttributeError):
                old_src = None
            if old_src in ("qat", "distill"):
                # only reachable via --recalibrate (trained scales are
                # otherwise pinned above) — the file being replaced is
                # the ONLY copy of the trained scales, so say so loudly
                print(f"int8: WARNING — overwriting {old_src}-trained "
                      f"scales at {path} with a fresh {source} "
                      "calibration (--recalibrate); the trained scales "
                      "have no other copy (re-run the export tool to "
                      "regenerate)", flush=True)
            try:
                # atomic write: concurrent starters / mid-write kills
                # must never leave a truncated file behind
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(
                        pack_scales(scales, weights_hash=self._qhash,
                                    source=source, n_images=n_images,
                                    stat=stat_used,
                                    headroom=self._calib_headroom,
                                    calib_fingerprint=fingerprint,
                                    fast_decode=bool(self._fast_decode),
                                    crop=self.crop,
                                    n_crops=self.n_crops),
                        f, indent=1, sort_keys=True)
                os.replace(tmp, path)
            except OSError:
                pass  # read-only checkpoint dir: recalibrate next run
        self.int8_calib_source = source
        self.int8_calib_stat = stat_used
        feature_tta = ({"crop": self.crop, "n_crops": self.n_crops,
                        "level": self._feature_tta_level}
                       if self.tta_mode == "feature" else None)
        int8_apply = build_int8_apply(self._qnet, scales,
                                      n_classes=self._n_classes,
                                      feature_tta=feature_tta)

        def fwd(images_u8):
            from ..ingest.pipeline import eval_pipeline_s8
            from ..models.quant import shift_s8

            with jax.named_scope("ingest_s8"):
                if feature_tta is not None:
                    x = shift_s8(images_u8)  # base image; crops happen
                    #                          at the layer3 feature map
                elif images_u8.ndim == 5:
                    x = shift_s8(
                        images_u8.reshape((-1,) + images_u8.shape[-3:]))
                else:
                    x = eval_pipeline_s8(images_u8, n_crops=self.n_crops,
                                         crop=self.crop)
            with jax.named_scope("backbone_heads_int8"):
                logits = int8_apply(x)
            with jax.named_scope("tta_hierarchy"):
                logits = [
                    mean_tta_logits(l, self.n_crops, fold=self.tta_fold)
                    for l in logits
                ]
                return self._pack(predict_all(logits, self.harrays))

        self._int8_apply = jax.jit(fwd)
        self.int8_scales = scales

    def _forward_impl(self, variables, images_u8, n_crops, crop):
        if self._feature_apply is not None:
            # feature-space TTA: trunk on the normalized BASE image;
            # crops happen at the layer3 feature map (fast_infer docs)
            from ..ingest.pipeline import normalize

            with jax.named_scope("ingest"):
                x = normalize(images_u8, jnp.bfloat16)
            with jax.named_scope("backbone_heads_feature_tta"):
                logits = self._feature_apply(x)
            with jax.named_scope("tta_hierarchy"):
                logits = [mean_tta_logits(l, n_crops, fold=self.tta_fold)
                          for l in logits]
                return self._pack(predict_all(logits, self.harrays))
        with jax.named_scope("ingest"):
            if images_u8.ndim == 5:
                # host-precropped (B, n_crops, crop, crop, 3): normalize
                # only, fold crops into batch
                from ..ingest.pipeline import normalize

                x = normalize(
                    images_u8.reshape((-1,) + images_u8.shape[-3:]),
                    self.model.dtype,
                )
            else:
                x = eval_pipeline(images_u8, n_crops=n_crops, crop=crop,
                                  dtype=self.model.dtype)
        with jax.named_scope("backbone_heads"):
            if self._fast_apply is not None:
                logits = self._fast_apply(x)
            else:
                logits = self.model.apply(variables, x, train=False)
        with jax.named_scope("tta_hierarchy"):
            logits = [mean_tta_logits(l, n_crops, fold=self.tta_fold)
                      for l in logits]
            return self._pack(predict_all(logits, self.harrays))

    @staticmethod
    def _pack(preds):
        """{p_key: (cls_i32, lat, lng)} -> one (K, 3, B) f32 device
        array (keys sorted). A remote/tunneled device pays one host
        round trip PER transferred leaf — 12 leaves measured 468 ms p50
        single-image serving latency on the tunnel; packing makes it
        one transfer. Class indices are exact in f32 (< 2^24)."""
        return jnp.stack([
            jnp.stack([preds[k][0].astype(jnp.float32),
                       preds[k][1].astype(jnp.float32),
                       preds[k][2].astype(jnp.float32)])
            for k in sorted(preds)
        ])

    @property
    def pred_keys(self):
        """Sorted p_keys matching `_pack`'s leading axis."""
        return sorted([p.name for p in self.partitionings] + ["hierarchy"])

    def predict_batch(self, images_u8: np.ndarray):
        """uint8 (B, base, base, 3) -> {p_key: (cls, lat, lng)} numpy."""
        images = jnp.asarray(images_u8)
        if self.layout is not None:
            images = jax.device_put(images, self.layout.batch())
        if self._int8:
            if self._int8_apply is None:
                self._build_int8(images)
            flat = self._int8_apply(images)
        else:
            flat = self._forward(self.variables, images)
        flat = np.asarray(flat)  # ONE device->host transfer
        return {
            k: (flat[i, 0].astype(np.int64), flat[i, 1], flat[i, 2])
            for i, k in enumerate(self.pred_keys)
        }

    # -- folder-level drivers ------------------------------------------------

    def predict_dir(self, image_dir: str, batch_size: int = 64,
                    num_workers: Optional[int] = None,
                    process_slice=None) -> pd.DataFrame:
        """Reference inference.py output contract (README.md:118-124):
        rows of (img_id, p_key, pred_class, pred_lat, pred_lng).

        process_slice=(p, n): multi-process eval — this process handles
        sorted(files)[p::n] only (parallel/multihost.py)."""
        from ..data.image_folder import iter_image_folder

        rows = []
        for batch in iter_image_folder(
            image_dir, batch_size=batch_size, num_workers=num_workers,
            tencrop_host=(self.tta_mode == "host_exact"), crop=self.crop,
            fast_decode=self._fast_decode, process_slice=process_slice,
        ):
            preds = self.predict_batch(batch.images)
            for key, (cls, lat, lng) in preds.items():
                for i, img_id in enumerate(batch.ids):
                    if not batch.valid[i]:
                        continue
                    rows.append(
                        (img_id, key, int(cls[i]), float(lat[i]),
                         float(lng[i]))
                    )
        df = pd.DataFrame(
            rows,
            columns=["img_id", "p_key", "pred_class", "pred_lat", "pred_lng"],
        )
        return df.sort_values(["img_id", "p_key"]).reset_index(drop=True)

    def evaluate_dir(
        self,
        image_dir: str,
        meta: pd.DataFrame,
        batch_size: int = 64,
        thresholds_km=DEFAULT_THRESHOLDS_KM,
        num_workers: Optional[int] = None,
        process_slice=None,
    ) -> dict:
        """Reference test.py behavior (SURVEY.md §4.3): GCD threshold
        accuracies per p_key against a meta CSV (IMG_ID, LAT, LON).

        process_slice=(p, n): multi-process eval — this process scores
        sorted(files)[p::n] locally, then all processes merge their
        count-based accumulators (one tiny all-gather at the end), so
        the returned table covers the FULL directory on every process."""
        from ..data.image_folder import iter_image_folder

        gt = {
            str(r.IMG_ID): (float(r.LAT), float(r.LON))
            for r in meta.itertuples()
        }
        # pre-create one accumulator per pred key: every process must
        # bring the same key set to the cross-process merge, including
        # a process whose file slice is empty
        accs = {k: GcdAccumulator(thresholds_km) for k in self.pred_keys}
        n_missing = 0
        for batch in iter_image_folder(
            image_dir, batch_size=batch_size, num_workers=num_workers,
            tencrop_host=(self.tta_mode == "host_exact"), crop=self.crop,
            fast_decode=self._fast_decode, process_slice=process_slice,
        ):
            true_lat = np.zeros(len(batch.ids), np.float32)
            true_lng = np.zeros(len(batch.ids), np.float32)
            valid = np.array(batch.valid, copy=True)
            for i, img_id in enumerate(batch.ids):
                key = img_id
                if key not in gt:
                    key = os.path.splitext(img_id)[0]
                if key in gt:
                    true_lat[i], true_lng[i] = gt[key]
                else:
                    if valid[i]:
                        n_missing += 1
                    valid[i] = False
            preds = self.predict_batch(batch.images)
            for p_key, (cls, plat, plng) in preds.items():
                counts, total = gcd_threshold_counts(
                    jnp.asarray(plat), jnp.asarray(plng),
                    jnp.asarray(true_lat), jnp.asarray(true_lng),
                    thresholds_km, valid=jnp.asarray(valid),
                )
                accs[p_key].update(counts, total)
        if process_slice is not None and process_slice[1] > 1:
            from ..parallel.multihost import merge_gcd_accumulators

            n_missing = merge_gcd_accumulators(accs, n_missing)
        result = {k: a.result() for k, a in accs.items()}
        if n_missing:
            result["_n_images_without_meta"] = n_missing
        return result


def format_accuracy_table(results: dict, dataset_name: str = "") -> str:
    """Render the README-style accuracy table (reference README.md:169-187)."""
    keys = [k for k in results if not k.startswith("_")]
    order = [k for k in ("coarse", "middle", "fine", "hierarchy") if k in keys]
    order += [k for k in keys if k not in order]
    lines = []
    if dataset_name:
        lines.append(f"== {dataset_name}")
    header = None
    for key in order:
        accs = results[key]
        if header is None:
            ths = list(accs)
            header = "p_key".ljust(12) + "".join(
                f"{int(t)} km".rjust(10) for t in ths
            )
            lines.append(header)
        lines.append(
            key.ljust(12)
            + "".join(f"{100 * v:10.1f}" for v in accs.values())
        )
    return "\n".join(lines)
