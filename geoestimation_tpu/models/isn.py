"""ISN — Individual Scene Networks, redesigned TPU-first.

Reference (README.md:187, ECCV 2018 paper §ISN): the original ISN ran a
Caffe Places365 ResNet152 scene classifier that routed each image to one
of three *separate* scene-specialized geo networks (indoor / natural /
urban), each a full CNN — `ISN(M, f*, S3)`. That lived only in the
`original_tf` branch (SURVEY.md §1.5).

TPU-native redesign: three full backbones would triple HBM and leave 2/3
of the MXU work discarded per example. Instead ISN here is one shared
backbone with
  * a scene head (3-way, Places365-S3 concepts), and
  * per-scene geo heads: one (features -> n_classes_p) classifier per
    (scene, partitioning) pair, materialized as a single fused
    (features, n_scenes * sum_classes) matmul.
Routing is a hard per-example head-select (SURVEY.md §3.3: "a per-example
head-select, not MoE"), implemented as a one-hot einsum so it stays a
dense MXU op under jit — no gather, no dynamic shapes.

`__call__` keeps the `MultiPartitioningClassifier` contract (list of
(B, C_p) logits, routed by the predicted scene), so the inference engine
and the f* rule work unchanged. Training uses `with_scene` to also get
scene logits and route by ground-truth scene labels when available.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import build_backbone

SCENE_NAMES = ("indoor", "natural", "urban")


class ISNClassifier(nn.Module):
    n_classes: Sequence[int]
    n_scenes: int = 3
    arch: str = "resnet50"
    dtype: Any = jnp.bfloat16
    remat: bool = False

    def setup(self):
        self.backbone = build_backbone(self.arch, dtype=self.dtype,
                                       remat=self.remat)
        self.scene_head = nn.Dense(
            self.n_scenes, dtype=jnp.float32, name="scene_head"
        )
        total = sum(self.n_classes)
        self.geo_heads = nn.Dense(
            self.n_scenes * total, dtype=jnp.float32, name="scene_geo_heads"
        )

    def _heads(self, features):
        """(B, F) -> scene_logits (B, S), per-head logits list of
        (B, S, C_p)."""
        f32 = features.astype(jnp.float32)
        scene_logits = self.scene_head(f32)
        flat = self.geo_heads(f32)
        flat = flat.reshape(flat.shape[0], self.n_scenes, -1)
        out, start = [], 0
        for n in self.n_classes:
            out.append(flat[:, :, start:start + n])
            start += n
        return scene_logits, out

    def with_scene(self, images, train: bool = False):
        """Full outputs for training: (scene_logits, [per-head (B,S,C_p)])."""
        features = self.backbone(images, train=train)
        return self._heads(features)

    def __call__(self, images, train: bool = False,
                 scene: Optional[jnp.ndarray] = None):
        """Gated logits list of (B, C_p) — same contract as the base
        classifier. Routes by `scene` labels when given, else by the scene
        head's argmax (hard routing)."""
        scene_logits, heads = self.with_scene(images, train=train)
        route = scene if scene is not None else jnp.argmax(scene_logits, -1)
        gate = jax.nn.one_hot(route, self.n_scenes, dtype=jnp.float32)
        return [jnp.einsum("bsc,bs->bc", h, gate) for h in heads]

    def features(self, images, train: bool = False):
        return self.backbone(images, train=train)


def isn_loss(scene_logits, head_logits, geo_labels, scene_labels,
             scene_loss_weight: float = 1.0, label_smoothing: float = 0.0):
    """ISN training loss: scene CE + sum of per-partitioning CE on the
    ground-truth-scene head.

    Args:
      scene_logits: (B, S).
      head_logits: list of (B, S, C_p).
      geo_labels: (P, B) int32, -1 = ignore.
      scene_labels: (B,) int32, -1 = ignore (scene CE masked; geo routed by
        predicted scene for those examples).
    Returns (total, dict of components).
    """
    from .classifier import multi_head_cross_entropy

    s_valid = scene_labels >= 0
    s_safe = jnp.maximum(scene_labels, 0)
    s_logp = jnp.take_along_axis(
        jax.nn.log_softmax(scene_logits, -1), s_safe[:, None], axis=-1
    )[:, 0]
    s_nll = jnp.where(s_valid, -s_logp, 0.0)
    scene_loss = s_nll.sum() / jnp.maximum(s_valid.sum(), 1)

    route = jnp.where(s_valid, s_safe, jnp.argmax(scene_logits, -1))
    gate = jax.nn.one_hot(route, scene_logits.shape[-1], dtype=jnp.float32)
    gated = [jnp.einsum("bsc,bs->bc", h, gate) for h in head_logits]
    geo_loss, per_head = multi_head_cross_entropy(
        gated, geo_labels, label_smoothing=label_smoothing
    )
    total = geo_loss + scene_loss_weight * scene_loss
    return total, {"scene_loss": scene_loss, "geo_loss": geo_loss,
                   "per_head": per_head}
