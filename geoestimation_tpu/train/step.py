"""The jitted training / eval steps, sharded over the device mesh.

Reference hot loop (SURVEY.md §4.1): forward -> sum of per-head CE ->
backward -> SGD step, with DDP all-reduce on multi-GPU. TPU-native design:

  * One `jax.jit` with explicit NamedShardings: batch on the `data` axis,
    params replicated (fused head optionally on `model`); XLA turns the
    replicated-gradient constraint into a `psum` over ICI — the entire
    "communication backend" is this sharding annotation.
  * Augmentation (random crop/flip) + normalization run inside the step, so
    the host->device transfer is the uint8 batch, nothing else.
  * `donate_argnums` on the train state: params/opt_state buffers are
    reused in place, halving peak HBM.
  * Backbone runs bf16; loss/grad accumulate fp32 (params fp32).
  * BN statistics are global-batch by construction: the step is one jit
    over the whole (sharded) batch with replicated batch_stats outputs, so
    XLA inserts the cross-shard mean itself — there is no separate sync
    step. This holds in BOTH runtimes: single-controller GSPMD (one
    process, any local mesh) and the multi-controller runtime
    (parallel/multihost.py — every host runs this same jit over the
    global mesh; the semantics of the step are identical because the
    shardings are).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ingest.pipeline import train_pipeline
from ..models.classifier import multi_head_cross_entropy
from ..parallel.mesh import MeshLayout


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def train_step(state: TrainState, images_u8, labels, rng,
               label_smoothing: float = 0.0, crop: int = 224,
               dtype=jnp.bfloat16, augment: bool = True, crop_scale=None):
    """One optimization step. images_u8: (B, base, base, 3) uint8;
    labels: (P, B) int32 with -1 = ignore. Returns (state, metrics)."""
    if augment:
        step_rng = jax.random.fold_in(rng, state.step)
        x = train_pipeline(step_rng, images_u8, crop=crop, dtype=dtype,
                           crop_scale=crop_scale)
    else:
        from ..ingest.pipeline import center_crop, normalize

        x = normalize(center_crop(images_u8, crop), dtype)

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        total, per_head = multi_head_cross_entropy(
            logits, labels, label_smoothing=label_smoothing
        )
        return total, (per_head, mutated["batch_stats"])

    (loss, (per_head, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    metrics = {
        "loss": loss,
        **{f"loss_head{i}": l for i, l in enumerate(per_head)},
        "n_valid": (labels >= 0).all(axis=0).sum(),
    }
    return new_state, metrics


def eval_step(state: TrainState, images_u8, labels, crop: int = 224,
              dtype=jnp.bfloat16):
    """Validation loss on center crops (no augmentation)."""
    from ..ingest.pipeline import center_crop, normalize

    x = normalize(center_crop(images_u8, crop), dtype)
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    total, per_head = multi_head_cross_entropy(logits, labels)
    return {
        "val_loss": total,
        **{f"val_loss_head{i}": l for i, l in enumerate(per_head)},
    }, logits


def train_step_isn(state: TrainState, images_u8, labels, scene, rng,
                   label_smoothing: float = 0.0, crop: int = 224,
                   dtype=jnp.bfloat16, scene_loss_weight: float = 1.0,
                   augment: bool = True, crop_scale=None):
    """ISN optimization step: scene CE + geo CE on the ground-truth-scene
    heads (models/isn.py). scene: (B,) int32, -1 = unknown."""
    from ..models.isn import isn_loss

    if augment:
        step_rng = jax.random.fold_in(rng, state.step)
        x = train_pipeline(step_rng, images_u8, crop=crop, dtype=dtype,
                           crop_scale=crop_scale)
    else:
        from ..ingest.pipeline import center_crop, normalize

        x = normalize(center_crop(images_u8, crop), dtype)

    def loss_fn(params):
        (scene_logits, heads), mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, method="with_scene", mutable=["batch_stats"],
        )
        total, comps = isn_loss(
            scene_logits, heads, labels, scene,
            scene_loss_weight=scene_loss_weight,
            label_smoothing=label_smoothing,
        )
        return total, (comps, mutated["batch_stats"])

    (loss, (comps, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    metrics = {
        "loss": loss,
        "scene_loss": comps["scene_loss"],
        "geo_loss": comps["geo_loss"],
        "n_valid": (labels >= 0).all(axis=0).sum(),
    }
    return new_state, metrics


def eval_step_isn(state: TrainState, images_u8, labels, scene,
                  crop: int = 224, dtype=jnp.bfloat16):
    """ISN validation: geo loss on the *predicted-scene* head (the routing
    used at inference) + scene-classification counts. scene: (B,) int32,
    -1 = unknown (excluded from accuracy)."""
    import jax

    from ..ingest.pipeline import center_crop, normalize

    x = normalize(center_crop(images_u8, crop), dtype)
    scene_logits, heads = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False, method="with_scene",
    )
    route = jnp.argmax(scene_logits, -1)
    gate = jax.nn.one_hot(route, scene_logits.shape[-1], dtype=jnp.float32)
    gated = [jnp.einsum("bsc,bs->bc", h, gate) for h in heads]
    total, per_head = multi_head_cross_entropy(gated, labels)
    s_valid = scene >= 0
    metrics = {
        "val_loss": total,
        **{f"val_loss_head{i}": l for i, l in enumerate(per_head)},
        "scene_correct": ((route == scene) & s_valid).sum(),
        "scene_total": s_valid.sum(),
    }
    return metrics, gated


def make_jitted_isn_eval_step(layout: MeshLayout, crop=224,
                              dtype=jnp.bfloat16):
    fn = functools.partial(eval_step_isn, crop=crop, dtype=dtype)
    return jax.jit(
        fn,
        in_shardings=(None, layout.batch(), layout.labels(),
                      layout.batch()),
    )


def make_jitted_isn_train_step(layout: MeshLayout, label_smoothing=0.0,
                               crop=224, dtype=jnp.bfloat16,
                               scene_loss_weight=1.0, crop_scale=None):
    fn = functools.partial(
        train_step_isn, label_smoothing=label_smoothing, crop=crop,
        dtype=dtype, scene_loss_weight=scene_loss_weight,
        crop_scale=crop_scale,
    )
    return jax.jit(
        fn,
        in_shardings=(None, layout.batch(), layout.labels(),
                      layout.batch(), layout.replicated()),
        donate_argnums=(0,),
    )


def make_jitted_train_step(layout: MeshLayout, label_smoothing=0.0,
                           crop=224, dtype=jnp.bfloat16, crop_scale=None):
    """Bind shardings: state replicated (head on model axis), batch on data.

    Donates the state so buffers update in place.
    """
    fn = functools.partial(
        train_step, label_smoothing=label_smoothing, crop=crop,
        dtype=dtype, crop_scale=crop_scale,
    )
    return jax.jit(
        fn,
        in_shardings=(None, layout.batch(), layout.labels(),
                      layout.replicated()),
        donate_argnums=(0,),
    )


def make_jitted_eval_step(layout: MeshLayout, crop=224, dtype=jnp.bfloat16):
    fn = functools.partial(eval_step, crop=crop, dtype=dtype)
    return jax.jit(
        fn,
        in_shardings=(None, layout.batch(), layout.labels()),
    )
