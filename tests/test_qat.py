"""Quantization-aware training (models/qat.py).

Pins the three contracts QAT depends on:
  1. the fake-quant grids match the serving quantizer exactly
     (`_quant_weight` / requant-site semantics of build_int8_apply),
  2. fold -> unfold -> refold round-trips (identity-BN export), so the
     QAT result flows through every existing checkpoint consumer,
  3. the STE actually learns (loss decreases through the quantizer) and
     the exported checkpoint serves via the real CLIs at --precision 8.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoestimation_tpu.models.classifier import MultiPartitioningClassifier
from geoestimation_tpu.models.qat import (
    build_qat_apply,
    fake_quant_act,
    fake_quant_weight,
    fold_variables,
    make_qat_train_step,
    quantize_folded,
    unfold_to_variables,
)
from geoestimation_tpu.models.quant import (
    _quant_weight,
    build_int8_apply,
    calibrate,
    quantize_model,
)

N_CLASSES = (4, 7)


def _noisy_variables(seed=0, arch="resnet14"):
    """Random resnet14 classifier variables with non-degenerate BNs
    (init zeroes bn3 scales, which would make conv3 folding trivial)."""
    model = MultiPartitioningClassifier(
        n_classes=N_CLASSES, arch=arch, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    rng = np.random.default_rng(seed)

    def perturb(path, a):
        a = np.asarray(a, np.float32)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            return a + rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
        if name == "var":
            return a + rng.uniform(0.1, 0.5, a.shape).astype(np.float32)
        if name == "mean":
            return a + rng.normal(0, 0.1, a.shape).astype(np.float32)
        return a

    params = jax.tree_util.tree_map_with_path(
        perturb, jax.device_get(variables["params"]))
    stats = jax.tree_util.tree_map_with_path(
        perturb, jax.device_get(variables["batch_stats"]))
    return model, {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def tiny():
    model, variables = _noisy_variables()
    rng = np.random.default_rng(7)
    images_u8 = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    scales = calibrate(variables, [images_u8], arch="resnet14",
                       n_crops=1, crop=64)
    return {"model": model, "variables": variables,
            "images": images_u8, "scales": scales}


class TestPrimitives:
    def test_weight_grid_matches_serving_quantizer(self):
        rng = np.random.default_rng(3)
        k = rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32)
        k[..., 5] = 0.0  # zero channel -> scale-1 guard
        q, s = _quant_weight(k)
        served = q.astype(np.float32) * s
        faked = np.asarray(fake_quant_weight(jnp.asarray(k)))
        assert np.array_equal(served, faked)

    def test_weight_grid_matches_at_reduced_bits(self, monkeypatch):
        """GEO_WEIGHT_BITS (round-5): serving and QAT grids stay
        bit-matched at any weight width, values land on the reduced
        grid, and the default is exactly the 8-bit/127 grid."""
        from geoestimation_tpu.models.quant import weight_qmax

        assert weight_qmax() == 127.0
        rng = np.random.default_rng(4)
        k = rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32)
        monkeypatch.setenv("GEO_WEIGHT_BITS", "4")
        assert weight_qmax() == 7.0
        q, s = _quant_weight(k)
        assert int(np.abs(q).max()) <= 7
        # per-channel: at most 15 distinct levels used
        for o in range(q.shape[-1]):
            assert len(np.unique(q[..., o])) <= 15
        served = q.astype(np.float32) * s
        faked = np.asarray(fake_quant_weight(jnp.asarray(k)))
        assert np.array_equal(served, faked)
        monkeypatch.setenv("GEO_WEIGHT_BITS", "1")
        with pytest.raises(ValueError, match="GEO_WEIGHT_BITS"):
            weight_qmax()

    def test_weight_gradient_is_identity(self):
        k = jnp.asarray([[0.3, -0.7], [0.01, 0.0]], jnp.float32)
        g = jax.grad(lambda w: jnp.sum(fake_quant_weight(w) * 2.0))(k)
        assert np.allclose(np.asarray(g), 2.0)

    def test_act_values_and_clip_gradient(self):
        s = 0.5
        x = jnp.asarray([-1.0, 0.2, 63.5 * s, 127 * s, 200 * s])
        y = np.asarray(fake_quant_act(x, s, lo=0.0))
        # relu'd, on-grid, clipped at 127*s
        assert np.allclose(y, [0.0, 0.0, 64 * s, 127 * s, 127 * s])
        g = np.asarray(jax.grad(
            lambda v: jnp.sum(fake_quant_act(v, s, lo=0.0)))(x))
        # pass-through inside [0, 127*s]; zero where relu/clip saturate
        assert np.allclose(g, [0.0, 1.0, 1.0, 1.0, 0.0])
        # signed site (lo=-127): negatives pass
        g2 = np.asarray(jax.grad(
            lambda v: jnp.sum(fake_quant_act(v, s, lo=-127.0)))(x))
        assert np.allclose(g2, [1.0, 1.0, 1.0, 1.0, 0.0])

    def test_upper_ste_gradient_de_ratchets(self):
        """upper_ste=True: gradient passes through the UPPER clip (the
        saturation-ratchet fix) while the relu's lower side keeps its
        zero gradient; at the signed _y3 site (lo=-127, a
        quantizer-imposed bound, not a relu) both clips pass."""
        s = 0.5
        x = jnp.asarray([-80.0 * s, -1.0, 0.2, 127 * s, 200 * s])
        # values are unchanged by the knob (same forward)
        y_m = np.asarray(fake_quant_act(x, s, lo=0.0))
        y_u = np.asarray(fake_quant_act(x, s, lo=0.0, upper_ste=True))
        assert np.array_equal(y_m, y_u)
        g = np.asarray(jax.grad(lambda v: jnp.sum(
            fake_quant_act(v, s, lo=0.0, upper_ste=True)))(x))
        assert np.allclose(g, [0.0, 0.0, 1.0, 1.0, 1.0])
        g2 = np.asarray(jax.grad(lambda v: jnp.sum(
            fake_quant_act(v, s, lo=-127.0, upper_ste=True)))(x))
        assert np.allclose(g2, [1.0, 1.0, 1.0, 1.0, 1.0])
        # below-the-signed-floor values also pass
        g3 = np.asarray(jax.grad(lambda v: jnp.sum(
            fake_quant_act(v, s, lo=-127.0, upper_ste=True)))(
                jnp.asarray([-200.0 * s])))
        assert np.allclose(g3, [1.0])


class TestFolding:
    def test_quantize_folded_matches_quantize_model(self, tiny):
        qnet_ref = quantize_model(tiny["variables"], arch="resnet14")
        qnet_qat = quantize_folded(
            fold_variables(tiny["variables"], arch="resnet14"),
            arch="resnet14")
        assert np.array_equal(qnet_ref["stem"][0], qnet_qat["stem"][0])
        assert np.allclose(qnet_ref["stem"][2], qnet_qat["stem"][2],
                           rtol=1e-6, atol=1e-6)
        for name, qb in qnet_ref["blocks"].items():
            for cname in qb:
                assert np.array_equal(qb[cname][0],
                                      qnet_qat["blocks"][name][cname][0]), \
                    f"{name}/{cname} int8 weights diverge"

    def test_unfold_round_trip(self, tiny):
        folded = fold_variables(tiny["variables"], arch="resnet14")
        unfolded = unfold_to_variables(folded, tiny["variables"],
                                       arch="resnet14")
        refolded = fold_variables(unfolded, arch="resnet14")

        flat0, _ = jax.tree_util.tree_flatten_with_path(
            jax.device_get(folded))
        flat1 = dict(jax.tree_util.tree_flatten_with_path(
            jax.device_get(refolded))[0])
        flat1 = {jax.tree_util.keystr(k): v for k, v in flat1.items()}
        for path, v0 in flat0:
            v1 = flat1[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                np.asarray(v0), np.asarray(v1), rtol=2e-5, atol=1e-5,
                err_msg=f"round-trip diverged at {path}")

        # and the serving integers barely move (only float-boundary ties)
        q0 = quantize_folded(folded, arch="resnet14")
        q1 = quantize_model(unfolded, arch="resnet14")
        total = flips = 0
        for name, qb in q0["blocks"].items():
            for cname in qb:
                a, b = qb[cname][0], q1["blocks"][name][cname][0]
                total += a.size
                flips += int((a != b).sum())
        assert flips / total < 1e-3, f"{flips}/{total} int8 weights moved"


class TestForward:
    def test_qat_apply_matches_int8_serving(self, tiny):
        """The QAT fp32 simulation must track the integer serving path:
        same grids, same site placement -> near-identical logits (up to
        fp32 accumulation vs exact s32 on round-to-grid boundaries)."""
        from geoestimation_tpu.ingest.pipeline import eval_pipeline_s8

        variables, images = tiny["variables"], tiny["images"]
        scales = tiny["scales"]
        qnet = quantize_model(variables, arch="resnet14")
        serve = build_int8_apply(qnet, scales, n_classes=N_CLASSES)
        x_s8 = eval_pipeline_s8(jnp.asarray(images), n_crops=1, crop=64)
        ref = [np.asarray(l) for l in serve(x_s8)]

        folded = fold_variables(variables, arch="resnet14")
        apply_fn = build_qat_apply("resnet14", scales,
                                   n_classes=N_CLASSES)
        got = [np.asarray(l) for l in
               apply_fn(folded, x_s8.astype(jnp.float32))]

        for r, g in zip(ref, got):
            spread = float(r.max() - r.min()) or 1.0
            assert np.max(np.abs(r - g)) < 0.02 * spread, \
                f"max dev {np.max(np.abs(r - g))} vs spread {spread}"
            assert np.array_equal(np.argmax(r, -1), np.argmax(g, -1))


class TestTraining:
    def test_qat_step_learns(self, tiny):
        import optax

        variables, images = tiny["variables"], tiny["images"]
        rng = np.random.default_rng(11)
        labels = jnp.asarray(np.stack([
            rng.integers(0, n, len(images)) for n in N_CLASSES
        ]).astype(np.int32))

        folded = fold_variables(variables, arch="resnet14")
        tx = optax.sgd(3e-4, momentum=0.9)
        opt_state = tx.init(folded)
        apply_fn = build_qat_apply("resnet14", tiny["scales"],
                                   n_classes=N_CLASSES)
        step = jax.jit(make_qat_train_step(apply_fn, tx, crop=56),
                       donate_argnums=(0, 1))
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(30):
            folded, opt_state, m = step(
                folded, opt_state, jnp.asarray(images), labels, key,
                jnp.int32(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, \
            f"QAT loss did not decrease: {losses[0]:.3f} -> {losses[-1]:.3f}"

    def test_qat_step_crop_scale_matches_training_views(self, tiny):
        """`make_qat_train_step(crop_scale=...)` must feed
        RandomResizedCrop-style views (the recipe checkpoints trained
        with train_crop_scale were built on), not plain crops — the
        realistic-world QAT regression: fine-tuning through a
        mismatched view distribution starts the loss off the
        checkpoint's converged value."""
        import optax

        variables, images = tiny["variables"], tiny["images"]
        rng = np.random.default_rng(3)
        labels = jnp.asarray(np.stack([
            rng.integers(0, n, len(images)) for n in N_CLASSES
        ]).astype(np.int32))
        folded = fold_variables(variables, arch="resnet14")
        tx = optax.sgd(0.0)
        apply_fn = build_qat_apply("resnet14", tiny["scales"],
                                   n_classes=N_CLASSES)
        key = jax.random.PRNGKey(0)

        def loss_with(crop_scale):
            step = jax.jit(make_qat_train_step(
                apply_fn, tx, crop=56, crop_scale=crop_scale))
            _, _, m = step(folded, tx.init(folded), jnp.asarray(images),
                           labels, key, jnp.int32(0))
            return float(m["loss"])

        plain = loss_with(None)
        resized = loss_with((0.3, 0.6))
        unit = loss_with((1.0, 1.0))  # degenerate range = plain crop
        assert np.isfinite(plain) and np.isfinite(resized)
        # a strict zoom-in range sees genuinely different views
        assert resized != plain
        assert unit == plain

    def test_isn_qat_frozen_scene_gate(self):
        """ISN QAT (round-4, VERDICT next #9): the scene gate stays
        bit-identical through training (frozen — argmax routing passes
        no gradient, the head is stop-gradiented, and the loss has no
        scene term) while the trunk + per-scene geo heads learn through
        the quantizer. The exported checkpoint must round-trip through
        quantize_model with isn=True routing intact."""
        import optax

        from geoestimation_tpu.models.isn import ISNClassifier

        model = ISNClassifier(n_classes=N_CLASSES, n_scenes=3,
                              arch="resnet14", dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               train=False)
        rng = np.random.default_rng(5)
        images = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
        labels = jnp.asarray(np.stack(
            [rng.integers(0, n, 4) for n in N_CLASSES]).astype(np.int32))
        scales = calibrate(variables, [images], arch="resnet14",
                           n_crops=1, crop=56)

        folded = fold_variables(variables, arch="resnet14")
        assert "scene_head" in folded["heads"]
        scene_before = jax.device_get(folded["heads"]["scene_head"])
        tx = optax.sgd(3e-4, momentum=0.9)
        opt_state = tx.init(folded)
        apply_fn = build_qat_apply("resnet14", scales,
                                   n_classes=N_CLASSES)
        step = jax.jit(make_qat_train_step(apply_fn, tx, crop=56),
                       donate_argnums=(0, 1))
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(20):
            folded, opt_state, m = step(
                folded, opt_state, jnp.asarray(images), labels, key,
                jnp.int32(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        # the frozen gate: scene head params bit-identical
        scene_after = jax.device_get(folded["heads"]["scene_head"])
        for k in ("kernel", "bias"):
            np.testing.assert_array_equal(scene_before[k], scene_after[k])
        # geo heads actually moved
        assert not np.array_equal(
            jax.device_get(folded["heads"]["scene_geo_heads"]["kernel"]),
            jax.device_get(fold_variables(variables, arch="resnet14")
                           ["heads"]["scene_geo_heads"]["kernel"]))

        # export: unfold -> quantize_model keeps ISN routing
        new_vars = unfold_to_variables(folded, variables, arch="resnet14")
        qnet = quantize_model(new_vars, arch="resnet14")
        assert qnet["isn"] is True
        # direct export agrees
        qnet2 = quantize_folded(folded, arch="resnet14")
        assert qnet2["isn"] is True
        np.testing.assert_array_equal(qnet["stem"][0], qnet2["stem"][0])
        # the quantized net routes: int8 apply runs end to end
        apply_int8 = build_int8_apply(qnet, scales, n_classes=N_CLASSES)
        from geoestimation_tpu.models.quant import shift_s8

        x = shift_s8(jnp.asarray(images[:, :56, :56]))
        out = apply_int8(x)
        assert len(out) == len(N_CLASSES)
        assert all(np.isfinite(np.asarray(o)).all() for o in out)


class TestAnchoredQAT:
    """Round-4 additions: the frozen fp32 teacher (fake_quant=False),
    the saturation taps, and the KL anchor term — built after the
    realistic-world QAT regression where plain-CE fine-tuning drifted
    held-out predictions 3 pt past the cross-checkpoint parity budget
    (docs/QUANTIZATION.md round-4 findings)."""

    def test_teacher_mode_is_the_folded_fp32_forward(self, tiny):
        """build_qat_apply(fake_quant=False) must BE the original
        network: same logits as model.apply on normalized pixels (the
        folded graph consumes pixel-128 instead)."""
        from geoestimation_tpu.ingest.pipeline import normalize

        model, variables = tiny["model"], tiny["variables"]
        u8 = jnp.asarray(tiny["images"])
        ref = model.apply(variables, normalize(u8, jnp.float32),
                          train=False)
        folded = fold_variables(variables, arch="resnet14")
        teacher = build_qat_apply("resnet14", tiny["scales"],
                                  n_classes=N_CLASSES, fake_quant=False)
        got = teacher(folded, u8.astype(jnp.float32) - 128.0)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=0.1, atol=0.15)
            np.testing.assert_array_equal(
                np.asarray(g).argmax(-1), np.asarray(r).argmax(-1))

    def test_saturation_taps(self, tiny):
        """taps=True returns the per-site fraction of values above the
        clip ceiling — ~0 under generous scales, large under scales
        squeezed far below the activation range."""
        variables = tiny["variables"]
        folded = fold_variables(variables, arch="resnet14")
        x = jnp.asarray(tiny["images"], jnp.float32) - 128.0

        generous = {k: v * 100.0 for k, v in tiny["scales"].items()}
        apply_g = build_qat_apply("resnet14", generous,
                                  n_classes=N_CLASSES, fake_quant=False,
                                  taps=True)
        _, sat = apply_g(folded, x)
        assert set(sat) == set(tiny["scales"])
        assert all(float(v) == 0.0 for v in sat.values())

        squeezed = {k: v / 1000.0 for k, v in tiny["scales"].items()}
        apply_s = build_qat_apply("resnet14", squeezed,
                                  n_classes=N_CLASSES, fake_quant=False,
                                  taps=True)
        _, sat_s = apply_s(folded, x)
        assert float(sat_s["stem"]) > 0.25

    def test_anchor_requires_teacher(self, tiny):
        import optax

        apply_fn = build_qat_apply("resnet14", tiny["scales"],
                                   n_classes=N_CLASSES)
        with pytest.raises(ValueError, match="teacher"):
            make_qat_train_step(apply_fn, optax.sgd(1e-4), crop=56,
                                anchor_weight=1.0)

    def test_anchored_step_pins_predictions(self, tiny):
        """Fine-tuning on random labels drifts the net away from the
        teacher; the anchor term must hold the student's held-out-view
        KL to the teacher well below the unanchored run's (the contract
        quant_study's --ref_checkpoint measures). Weight 1.0 — the
        CPU sweep that sized this test measured eval-KL 121.7 (free) →
        6.8 (aw=1) → 1.0 (aw=3), and DIVERGENCE at aw ≥ 10 under
        SGD+momentum (the same instability tta_distill documented),
        so the tool's recommended range is ~0.3-3."""
        import optax

        variables, images = tiny["variables"], tiny["images"]
        rng = np.random.default_rng(17)
        labels = jnp.asarray(np.stack([
            rng.integers(0, n, len(images)) for n in N_CLASSES
        ]).astype(np.int32))
        x_eval = jnp.asarray(images[:, :56, :56], jnp.float32) - 128.0
        apply_fn = build_qat_apply("resnet14", tiny["scales"],
                                   n_classes=N_CLASSES)
        teacher_apply = build_qat_apply("resnet14", tiny["scales"],
                                        n_classes=N_CLASSES,
                                        fake_quant=False)
        t_folded = fold_variables(variables, arch="resnet14")
        t_logits = teacher_apply(t_folded, x_eval)

        from geoestimation_tpu.models.qat import teacher_student_kl

        def eval_kl(got):
            return float(teacher_student_kl(t_logits, got))

        def drift(anchor_weight):
            folded = fold_variables(variables, arch="resnet14")
            tx = optax.sgd(3e-4, momentum=0.9)
            opt_state = tx.init(folded)
            step = jax.jit(make_qat_train_step(
                apply_fn, tx, crop=56, anchor_weight=anchor_weight,
                teacher_apply=teacher_apply, teacher_folded=t_folded),
                donate_argnums=(0, 1))
            key = jax.random.PRNGKey(0)
            m = None
            for i in range(25):
                folded, opt_state, m = step(
                    folded, opt_state, jnp.asarray(images), labels, key,
                    jnp.int32(i))
            if anchor_weight:
                assert np.isfinite(float(m["anchor_kl"]))
            return eval_kl(apply_fn(folded, x_eval))

        free = drift(0.0)
        pinned = drift(1.0)
        # measured here: free ~22, pinned ~6 (3.6x separation)
        assert pinned < free * 0.5, (free, pinned)


class TestCLI:
    def test_finetune_export_serves(self, tmp_path):
        """Full loop: train 2 steps -> QAT fine-tune 2 steps -> the
        exported checkpoint serves through classification.inference at
        --precision 8 with the QAT-written scales cache."""
        import io

        import yaml
        from PIL import Image

        from geoestimation_tpu.data import shards as shards_lib
        from geoestimation_tpu.geo.create_cells import create_cells

        rng = np.random.default_rng(0)
        pts = np.column_stack([
            rng.uniform(47.6, 49.4, 400), rng.uniform(1.6, 3.4, 400)])
        cell_files = []
        for mx, fn in [(200, "cells_50_5000.csv"), (60, "cells_50_2000.csv")]:
            cells = create_cells(pts[:, 0], pts[:, 1], img_min=5,
                                 img_max=mx)
            path = str(tmp_path / fn)
            cells.partitioning.to_csv(path)
            cell_files.append(path)
        recs = []
        for i in range(16):
            arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=85)
            recs.append({"id": f"t_{i}", "image": buf.getvalue(),
                         "lat": float(rng.uniform(47.6, 49.4)),
                         "lng": float(rng.uniform(1.6, 3.4))})
        shards_lib.write_shard(recs, str(tmp_path / "train" / "s0.msgpack"))
        config = {
            "model_params": {
                "arch": "resnet14", "dtype": "float32",
                "partitionings": {"shortnames": ["coarse", "middle"],
                                  "files": cell_files},
            },
            "train_params": {
                "batch_size": 8, "epochs": 1,
                "train_shards": [str(tmp_path / "train" / "*.msgpack")],
                "num_workers": 2,
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "checkpoint_every_steps": 0,
                "image_size": 64, "steps_per_epoch": 2,
                # exercises qat_finetune's augmentation-matching path:
                # the QAT step must fine-tune through the SAME
                # RandomResizedCrop view distribution the checkpoint
                # was trained with (a plain-crop mismatch inflates the
                # starting loss before QAT has done anything)
                "train_crop_scale": [0.5, 1.0],
            },
        }
        cfg = str(tmp_path / "qat.yml")
        with open(cfg, "w") as f:
            yaml.safe_dump(config, f)

        from classification.train_base import main as train_main

        train_main(["--config", cfg, "--max_steps", "2", "--cpu"])

        from tools.qat_finetune import main as qat_main

        out = str(tmp_path / "ckpt_qat")
        rc = qat_main(["--checkpoint", str(tmp_path / "ckpt"),
                       "--out", out, "--steps", "2", "--lr", "1e-4",
                       "--calib_images", "8", "--batch_size", "4",
                       "--cpu"])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "int8_scales.json"))
        import json

        with open(os.path.join(out, "int8_scales.json")) as f:
            packed = json.load(f)
        assert packed["provenance"]["source"] == "qat"

        img_dir = tmp_path / "q"
        img_dir.mkdir()
        for i in range(2):
            arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / f"x_{i}.jpg", quality=90)

        from classification.inference import main as infer_main

        out_csv = str(tmp_path / "preds.csv")
        infer_main(["--checkpoint", out, "--image_dir", str(img_dir),
                    "--output", out_csv, "--crops", "1",
                    "--batch_size", "2", "--precision", "8"])
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert len(df) == 2 * 3  # coarse, middle, hierarchy

        # non-harmful by construction: at lr 0 no step can improve the
        # parity proxy, so snapshot retention must export the ORIGINAL
        # weights (fold-equal to the input checkpoint)
        out0 = str(tmp_path / "ckpt_qat_lr0")
        rc = qat_main(["--checkpoint", str(tmp_path / "ckpt"),
                       "--out", out0, "--steps", "2", "--lr", "0",
                       "--calib_images", "8", "--batch_size", "4",
                       "--eval_images", "8", "--eval_every", "1",
                       "--eval_dir", str(img_dir),
                       "--cpu"])
        assert rc == 0
        from geoestimation_tpu.train.checkpoint import load_for_inference

        _, st_orig = load_for_inference(str(tmp_path / "ckpt"))
        _, st_qat0 = load_for_inference(out0)
        f_orig = fold_variables(
            {"params": st_orig["params"],
             "batch_stats": st_orig["batch_stats"]}, arch="resnet14")
        f_qat0 = fold_variables(
            {"params": st_qat0["params"],
             "batch_stats": st_qat0["batch_stats"]}, arch="resnet14")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5),
            f_orig, f_qat0)
