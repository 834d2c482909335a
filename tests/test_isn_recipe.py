"""ISN recipe: scene classification quality + routed-heads advantage.

VERDICT r1 next #9 ("make ISN real"): the reference's ISN(M, f*, S3) routed
images through scene-specialized networks and beat the base model
(reference README.md:56-57, 186-187). Without MP-16/Places365 this is
demonstrated on the synthetic scene world:

1. `test_routed_heads_beat_shared_head...` — the architectural claim in
   its cleanest form: identical features, identical optimizer/steps, only
   the head differs. Locations depend on the (scene, cue) INTERACTION
   ((scene + cue) % 4), which a single shared linear head provably cannot
   express (additive in one-hot(scene), one-hot(cue)) while per-scene
   routed linear heads express exactly (given the scene, the map is
   linear). Mirrors models/isn.py's one-hot-einsum routing.

2. `test_isn_e2e_scene_world` — the full user recipe:
   tools/make_demo_world.py --scene_world (scene-colored, cue-striped
   images; location = f(scene, cue)) -> classification.train_base with
   the generated isn.yml -> validation reports scene_acc ~1.0 and
   hierarchy GCD far above the 1-in-4-cities chance line. Exercises
   train_step_isn, eval_step_isn, scene-label CSV plumbing
   (S3_Label column, reference README.md:209-210) end to end.

(On this small world a fully trainable deep backbone can eventually
absorb the scene x cue interaction itself, so base-vs-ISN e2e accuracy is
not a stable discriminator — the head-level test is; see docs/ISN.md.)
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_SCENES, N_CUES = 3, 4


def _xor_data(rng, n):
    scene = rng.integers(0, N_SCENES, n)
    cue = rng.integers(0, N_CUES, n)
    label = (scene + cue) % N_CUES
    feats = np.concatenate(
        [np.eye(N_SCENES, dtype=np.float32)[scene],
         np.eye(N_CUES, dtype=np.float32)[cue]], axis=1
    ) + rng.normal(0, 0.05, (n, N_SCENES + N_CUES)).astype(np.float32)
    return feats, scene.astype(np.int32), label.astype(np.int32)


def _train_linear(params, loss_fn, steps=300, lr=0.5):
    import optax

    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state)
    return params


def test_routed_heads_beat_shared_head_when_scenes_separable():
    rng = np.random.default_rng(11)
    xtr, str_, ytr = _xor_data(rng, 4096)
    xte, ste, yte = _xor_data(rng, 1024)
    d = xtr.shape[1]

    def ce(logits, y):
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(lp, y[:, None], 1).mean()

    # shared single head (the base classifier's head shape)
    w0 = {"w": jnp.zeros((d, N_CUES)), "b": jnp.zeros(N_CUES)}
    shared = _train_linear(
        w0, lambda p: ce(xtr @ p["w"] + p["b"], jnp.asarray(ytr))
    )
    shared_acc = float(
        (jnp.argmax(xte @ shared["w"] + shared["b"], -1)
         == jnp.asarray(yte)).mean()
    )

    # per-scene routed heads — models/isn.py one-hot-einsum routing
    w0 = {"w": jnp.zeros((d, N_SCENES * N_CUES)),
          "b": jnp.zeros(N_SCENES * N_CUES)}

    def routed_logits(p, x, scene):
        flat = (x @ p["w"] + p["b"]).reshape(-1, N_SCENES, N_CUES)
        gate = jax.nn.one_hot(scene, N_SCENES, dtype=jnp.float32)
        return jnp.einsum("bsc,bs->bc", flat, gate)

    routed = _train_linear(
        w0,
        lambda p: ce(routed_logits(p, xtr, jnp.asarray(str_)),
                     jnp.asarray(ytr)),
    )
    routed_acc = float(
        (jnp.argmax(routed_logits(routed, xte, jnp.asarray(ste)), -1)
         == jnp.asarray(yte)).mean()
    )

    assert routed_acc >= 0.98, routed_acc
    assert shared_acc <= 0.80, shared_acc  # additive model can't do XOR
    assert routed_acc > shared_acc + 0.15


def test_isn_e2e_scene_world(tmp_path):
    from tools.make_demo_world import main as make_world

    world = str(tmp_path / "scene_world")
    make_world([
        "--output", world, "--n_train", "192", "--n_eval", "8",
        "--image_size", "64", "--arch", "resnet14", "--scene_world",
    ])

    from geoestimation_tpu.train.loop import Trainer
    from geoestimation_tpu.utils.config import load_config

    config = load_config(os.path.join(world, "isn.yml"))
    trainer = Trainer(config, search_dirs=[world])
    state = trainer.fit(max_steps=72, resume=False)
    val = trainer.validate(
        state,
        __import__(
            "geoestimation_tpu.train.step", fromlist=["x"]
        ).make_jitted_isn_eval_step(trainer.layout, crop=64,
                                    dtype=trainer.model.dtype),
    )
    # the scene head must essentially solve the 3-way scene task, and the
    # routed geo prediction must land in the right city (200 km) far more
    # often than the 1-in-4 chance line
    assert val["scene_acc"] >= 0.95, val
    assert val["gcd@200km"] >= 0.45, val


def _extract_features(model, variables, images_u8, crop=64, batch=32):
    """Frozen-backbone features for uint8 base images (center crop)."""
    from geoestimation_tpu.ingest.pipeline import center_crop, normalize

    @jax.jit
    def feats(x):
        return model.apply(variables, normalize(center_crop(x, crop),
                                                jnp.float32),
                           train=False, method="features")

    out = []
    for s in range(0, len(images_u8), batch):
        out.append(np.asarray(feats(jnp.asarray(images_u8[s:s + batch]))))
    return np.concatenate(out)


@pytest.mark.slow
def test_frozen_backbone_routed_vs_shared(tmp_path):
    """Round-3 (VERDICT next #6): the frozen-backbone e2e comparison —
    pretrain on a label law WITHOUT the scene x cue interaction, freeze
    the backbone, retrain both head types on the entangled labels.

    Measured finding (run twice before the assertions below were set,
    docs/ISN.md): the routed head reaches ~1.0 as the architecture
    argument predicts — but the shared linear head TIES on this toy
    world, because a deep ReLU conv backbone's features contain
    incidental scene x cue CONJUNCTIONS (every channel sees color and
    stripes co-occur in its patch) even when its training labels never
    reward them. Frozen-backbone does NOT make base-vs-ISN a stable
    toy-scale discriminator; the deterministic architectural proof
    remains the head-level isolation test above, and the reference's
    measured ISN gap lived at MP-16 scale (README.md:186-187). This test
    pins what IS stable: routing works end to end on frozen features
    through a PREDICTED scene (>= 0.9), and never loses to the shared
    head."""
    from tools.make_demo_world import main as make_world

    # Two worlds, SAME images (same seed -> identical rng draws), two
    # label laws: world A (plain) has city = cue, world B (entangled)
    # has city = (cue + scene) % 4. The backbone pretrains on A — its
    # features must encode scene (scene head CE) and cue (geo heads),
    # but A's labels give ZERO pressure to encode their product. The
    # frozen-feature head comparison then happens on B's labels, where
    # the product is exactly what a head must express.
    world_a = str(tmp_path / "world_plain")
    world = str(tmp_path / "world_entangled")
    common = ["--n_train", "240", "--n_eval", "48",
              "--image_size", "64", "--arch", "resnet14"]
    make_world(["--output", world_a] + common)
    make_world(["--output", world, "--scene_world"] + common)
    from geoestimation_tpu.train.loop import Trainer
    from geoestimation_tpu.utils.config import load_config

    config = load_config(os.path.join(world_a, "isn.yml"))
    trainer = Trainer(config, search_dirs=[world_a])
    state = trainer.fit(max_steps=60, resume=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # head-training examples: world B's images + ENTANGLED labels
    from geoestimation_tpu.data.loader import ShardBatcher, load_label_csv

    label_map, scene_map = load_label_csv(
        os.path.join(world, "train_labels.csv"),
        ["coarse", "middle", "fine"], with_scene=True)
    batcher = ShardBatcher(
        [os.path.join(world, "shards", "*.msgpack")], batch_size=48,
        label_map=label_map, scene_map=scene_map, shuffle=False,
        repeat=False, num_workers=2, mask_padding=True)
    imgs, fines, scenes, lls = [], [], [], []
    for b in batcher:
        keep = b.labels[0] >= 0
        imgs.append(b.images[keep])
        fines.append(b.labels[-1][keep])
        scenes.append(b.scene[keep])
        lls.append(b.latlng[keep])
    imgs = np.concatenate(imgs)
    fines = np.concatenate(fines).astype(np.int32)
    scenes = np.concatenate(scenes).astype(np.int32)
    xtr = _extract_features(trainer.model, variables, imgs)

    # eval examples: images + true latlng + true scene from eval_meta
    import pandas as pd

    from geoestimation_tpu.data.image_folder import iter_image_folder

    meta = pd.read_csv(os.path.join(world, "eval_meta.csv"))
    gt = {r.IMG_ID: (r.LAT, r.LON, int(r.S3_Label))
          for r in meta.itertuples()}
    eimgs, elat, elng = [], [], []
    for fb in iter_image_folder(os.path.join(world, "eval_images"),
                                batch_size=16):
        for i, img_id in enumerate(fb.ids):
            if fb.valid[i]:
                eimgs.append(fb.images[i])
                la, ln, _ = gt[img_id]
                elat.append(la)
                elng.append(ln)
    xte = _extract_features(trainer.model, variables, np.stack(eimgs))
    elat, elng = np.asarray(elat), np.asarray(elng)

    # head training on FROZEN features (same budget both ways), with a
    # LIMITED sample budget: a deep ReLU backbone's conv features
    # contain incidental scene x cue conjunctions (color and stripes
    # co-occur in every patch a channel looks at), so with unlimited
    # samples even a shared linear head eventually fits the interaction
    # through those weak, noisy directions. With few samples, the clean
    # per-scene structure routing exploits generalizes; the noisy
    # conjunction directions do not — this is the stable e2e margin.
    fine_part = trainer.partitionings[-1]
    n_fine = len(fine_part)
    n_scenes = 3
    d = xtr.shape[1]
    n_head_train = 66
    sel = np.random.default_rng(5).permutation(len(xtr))[:n_head_train]
    xtr, fines, scenes = xtr[sel], fines[sel], scenes[sel]
    xtr_j = jnp.asarray(xtr)
    fines_j = jnp.asarray(fines)

    def ce(logits, y):
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(lp, y[:, None], 1).mean()

    shared = _train_linear(
        {"w": jnp.zeros((d, n_fine)), "b": jnp.zeros(n_fine)},
        lambda p: ce(xtr_j @ p["w"] + p["b"], fines_j),
        steps=250, lr=0.05)

    def routed_logits(p, x, scene):
        flat = (x @ p["w"] + p["b"]).reshape(-1, n_scenes, n_fine)
        gate = jax.nn.one_hot(scene, n_scenes, dtype=jnp.float32)
        return jnp.einsum("bsc,bs->bc", flat, gate)

    routed = _train_linear(
        {"w": jnp.zeros((d, n_scenes * n_fine)),
         "b": jnp.zeros(n_scenes * n_fine)},
        lambda p: ce(routed_logits(p, xtr_j, jnp.asarray(scenes)),
                     fines_j),
        steps=250, lr=0.05)
    scene_head = _train_linear(
        {"w": jnp.zeros((d, n_scenes)), "b": jnp.zeros(n_scenes)},
        lambda p: ce(xtr_j @ p["w"] + p["b"], jnp.asarray(scenes)),
        steps=250, lr=0.05)

    def acc200(cls):
        from geoestimation_tpu.eval.metrics import great_circle_distance

        dist = np.asarray(great_circle_distance(
            fine_part.lat[cls], fine_part.lng[cls], elat, elng))
        return float((dist <= 200.0).mean())

    xte_j = jnp.asarray(xte)
    shared_cls = np.asarray(
        jnp.argmax(xte_j @ shared["w"] + shared["b"], -1))
    pred_scene = jnp.argmax(xte_j @ scene_head["w"] + scene_head["b"], -1)
    routed_cls = np.asarray(
        jnp.argmax(routed_logits(routed, xte_j, pred_scene), -1))
    shared_acc = acc200(shared_cls)
    routed_acc = acc200(routed_cls)
    print(f"frozen-backbone @200km: routed={routed_acc:.3f} "
          f"shared={shared_acc:.3f}")
    # routed heads express the interaction through predicted-scene
    # routing; the shared head may tie via incidental conjunction
    # features (see docstring) but must never win
    assert routed_acc >= 0.90, (routed_acc, shared_acc)
    assert routed_acc >= shared_acc - 1e-9, (routed_acc, shared_acc)


@pytest.mark.slow
def test_isn_texture_scene_world(tmp_path):
    """Round-3 (VERDICT next #6): scene routing on a world where scenes
    are TEXTURE-defined (fine/coarse checker / low-frequency blobs), not
    color-separable. The scene head must still learn the routing signal,
    and the reported confusion matrix must be diagonal-dominant."""
    from tools.make_demo_world import main as make_world

    world = str(tmp_path / "tex_world")
    make_world([
        "--output", world, "--n_train", "240", "--n_eval", "48",
        "--image_size", "64", "--jpeg_size", "216",
        "--arch", "resnet14", "--scene_world",
        "--style", "textured", "--scene_style", "texture",
    ])
    from geoestimation_tpu.train.loop import Trainer
    from geoestimation_tpu.utils.config import load_config

    config = load_config(os.path.join(world, "isn.yml"))
    # The world's isn.yml already carries the load-bearing part of the
    # recipe: train_crop_scale matched to the eval scale (frequency-
    # defined textures are not scale-invariant, so the default RRC range
    # trains on 3.25-4x downsampled views that never transfer to the
    # native-scale eval crop — see make_demo_world). On top of that,
    # texture scenes are subtler than the stripe geo cues: upweight the
    # scene CE (config.py scene_loss_weight) and hold the lr at the
    # value a dedicated scene-only probe converged with (0.02, no
    # decay inside this budget). Validated end to end: eval scene acc
    # 0.958, diagonal confusion.
    config.train_params.scene_loss_weight = 3.0
    config.train_params.optimizer.lr = 0.02
    config.train_params.lr_schedule.milestones = [1000]
    trainer = Trainer(config, search_dirs=[world])
    state = trainer.fit(max_steps=250, resume=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    import pandas as pd

    from geoestimation_tpu.data.image_folder import iter_image_folder
    from geoestimation_tpu.ingest.pipeline import center_crop, normalize

    meta = pd.read_csv(os.path.join(world, "eval_meta.csv"))
    gt_scene = {r.IMG_ID: int(r.S3_Label) for r in meta.itertuples()}

    @jax.jit
    def scene_of(x):
        scene_logits, _ = trainer.model.apply(
            variables, normalize(center_crop(x, 64), jnp.float32),
            train=False, method="with_scene")
        return jnp.argmax(scene_logits, -1)

    confusion = np.zeros((3, 3), np.int64)
    for fb in iter_image_folder(os.path.join(world, "eval_images"),
                                batch_size=16):
        pred = np.asarray(scene_of(jnp.asarray(fb.images)))
        for i, img_id in enumerate(fb.ids):
            if fb.valid[i]:
                confusion[gt_scene[img_id], pred[i]] += 1
    acc = confusion.trace() / confusion.sum()
    print(f"texture-scene confusion (rows=true):\n{confusion}")
    assert acc >= 0.8, (acc, confusion)
    # diagonal-dominant: every true scene is most often itself
    assert all(confusion[s].argmax() == s for s in range(3)), confusion
