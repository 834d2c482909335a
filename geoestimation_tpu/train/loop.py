"""Training loop: epochs, logging, validation, checkpointing.

The runtime half of the reference's `pl.Trainer.fit` usage (SURVEY.md
§4.1): per-batch jitted step on device, per-interval validation computing
val_loss + GCD metrics, best-val-loss checkpoint retention, resume from
latest. Also owns `jax.profiler` trace capture (`--profile_dir`,
SURVEY.md §5 Tracing).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import ShardBatcher, load_label_csv
from ..eval.engine import resolve_partitioning_paths
from ..eval.infer import HierarchyArrays, predict_hierarchical
from ..eval.metrics import GcdAccumulator, gcd_threshold_counts
from ..geo import Hierarchy, load_partitionings
from ..parallel.mesh import MeshLayout, make_mesh
from . import checkpoint as ckpt_lib
from .init import model_from_config
from .optim import build_optimizer
from .step import (
    TrainState,
    create_train_state,
    make_jitted_eval_step,
    make_jitted_train_step,
)


class Trainer:
    def __init__(self, config, search_dirs=(), layout: Optional[MeshLayout] = None,
                 log_fn=print):
        self.config = config
        self.tp = config.train_params
        # Multi-process runtime (parallel/multihost.py): every host runs
        # this same Trainer; host 0 owns logging + checkpoint writes.
        self.n_procs = jax.process_count()
        self.proc_id = jax.process_index()
        self.log = log_fn if self.proc_id == 0 else (lambda *_: None)
        paths = resolve_partitioning_paths(
            config.model_params.partitionings.files, list(search_dirs)
        )
        self.partitionings = load_partitionings(
            paths, names=list(config.model_params.partitionings.shortnames)
        )
        self.harrays = HierarchyArrays.from_hierarchy(
            Hierarchy.build(self.partitionings)
        )
        self.layout = layout or make_mesh(
            *(self.tp.mesh_shape or (None,))
        )
        if self.n_procs > 1:
            from ..parallel.multihost import data_axis_is_process_contiguous

            # LockstepSlicer hands each process contiguous rows of the
            # global batch; the mesh's data axis must map processes the
            # same way or make_array_from_process_local_data would pair
            # rows with the wrong hosts.
            if not data_axis_is_process_contiguous(self.layout.mesh):
                raise RuntimeError(
                    "multi-process mesh data axis is not process-"
                    "contiguous; build the mesh from process-sorted "
                    "devices")
        self.model = model_from_config(config, self.partitionings)
        # Without validation data every checkpoint is metric-less and
        # best-val-loss retention would keep all of them forever; fall
        # back to plain latest-N retention in that case.
        self.ckpt = ckpt_lib.CheckpointManager(
            self.tp.checkpoint_dir,
            max_to_keep=self.tp.keep_checkpoints,
            best_metric="val_loss" if self.tp.val_shards else None,
        )
        from ..utils.logging import MetricsLogger

        # CSV + TensorBoard mirror of everything printed (SURVEY.md §5).
        # Host 0 only: N processes appending to one metrics.csv would
        # interleave rows.
        if self.proc_id == 0:
            self.metrics = MetricsLogger(self.tp.checkpoint_dir,
                                         stdout=lambda s: None)
        else:
            class _Null:
                def log(self, *a, **k):
                    pass

            self.metrics = _Null()

    # -- state --------------------------------------------------------------

    def initial_state(self, steps_per_epoch: int) -> TrainState:
        tx, self.schedule = build_optimizer(
            self.tp.optimizer, self.tp.lr_schedule, steps_per_epoch
        )
        dummy = jnp.zeros((1, self.tp.image_size, self.tp.image_size, 3),
                          jnp.float32)
        variables = self.model.init(
            jax.random.PRNGKey(self.tp.seed), dummy, train=False
        )
        state = create_train_state(self.model, variables, tx)
        return self.place(state)

    def place(self, state: TrainState) -> TrainState:
        """Put the state on the mesh: params replicated except the fused
        head (model axis)."""
        shardings = TrainState(
            step=self.layout.replicated(),
            params=self.layout.params(state.params),
            batch_stats=jax.tree.map(
                lambda _: self.layout.replicated(), state.batch_stats
            ),
            # momentum follows its param's placement (head momentum on the
            # model axis) — replicating it would reshard the largest tensor
            # every step
            opt_state=self.layout.params(state.opt_state),
            tx=state.tx,
            apply_fn=state.apply_fn,
        )
        from ..parallel.multihost import global_put_tree

        return global_put_tree(state, shardings)

    def maybe_resume(self, state: TrainState) -> TrainState:
        latest = self.ckpt.latest_step()
        if latest is None:
            return state
        self.log(f"resuming from step {latest}")
        from ..parallel.multihost import host_local_tree

        restored = self.ckpt.restore(
            latest,
            template={
                "params": host_local_tree(state.params),
                "batch_stats": host_local_tree(state.batch_stats),
                "opt_state": host_local_tree(state.opt_state),
                "step": 0,
            },
        )
        state = state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return self.place(state)

    # -- data ---------------------------------------------------------------

    def _batcher(self, patterns, labels_csv, shuffle, seed):
        label_map = scene_map = None
        if labels_csv:
            label_map, scene_map = load_label_csv(
                labels_csv,
                self.config.model_params.partitionings.shortnames,
                with_scene=True,
            )
        feed = self.tp.data_feed
        if feed not in ("lockstep", "strided"):
            raise ValueError(
                f"unknown train_params.data_feed {feed!r}; "
                "expected 'lockstep' or 'strided'")
        common = dict(
            partitionings=None if label_map else self.partitionings,
            label_map=label_map,
            scene_map=scene_map,
            shuffle=shuffle,
            seed=seed,
            repeat=False,
            num_workers=self.tp.num_workers,
            # validation (shuffle=False) must not double-count tile-padded
            # duplicates in val_loss / GCD accuracy
            mask_padding=not shuffle,
        )
        if self.n_procs > 1 and feed == "strided" and shuffle:
            # strided (training feed only): each host reads shards[p::n]
            # and decodes only its LOCAL rows (IO+decode 1/N);
            # StridedFeed synchronizes batch counts so uneven shard
            # subsets can't deadlock a collective. Validation stays
            # lockstep: its metrics must match single-host runs exactly,
            # and a val set may have fewer shards than hosts.
            from ..data.shards import expand_shard_patterns
            from ..parallel.multihost import StridedFeed

            if self.tp.batch_size % self.n_procs:
                raise ValueError(
                    f"global batch {self.tp.batch_size} not divisible "
                    f"by {self.n_procs} processes")
            # validate here, not at first next(): every host sees the
            # same global shard list, so all raise together BEFORE any
            # collective — a single-host failure mid-stream would leave
            # the others hanging in the have-bit all-gather
            n_shards = len(expand_shard_patterns(patterns))
            if n_shards < self.n_procs:
                raise ValueError(
                    f"data_feed: strided needs >= 1 shard per process "
                    f"({n_shards} shards, {self.n_procs} processes); "
                    "re-shard the data or use data_feed: lockstep")
            return StridedFeed(ShardBatcher(
                patterns,
                batch_size=self.tp.batch_size // self.n_procs,
                host_id=self.proc_id,
                host_count=self.n_procs,
                **common,
            ))
        batcher = ShardBatcher(
            patterns,
            batch_size=self.tp.batch_size,
            # lockstep (default): every host materializes IDENTICAL
            # global batches (same shards, same seed) and keeps its
            # slice below — single-host semantics preserved exactly,
            # equal batch counts on every host (no collective deadlock)
            host_id=0,
            host_count=1,
            **common,
        )
        if self.n_procs > 1:
            from ..parallel.multihost import LockstepSlicer

            return LockstepSlicer(batcher, self.proc_id, self.n_procs)
        return batcher

    # -- device feed --------------------------------------------------------

    def _feed(self, arr, sharding, batch_axis=0):
        """Host batch -> device array. Single-process: plain transfer.
        Multi-process: this host's rows -> one GLOBAL jax.Array
        (parallel/multihost.py)."""
        if self.n_procs == 1:
            return jnp.asarray(arr)
        from ..parallel.multihost import global_batch_array

        return global_batch_array(sharding, np.asarray(arr), batch_axis,
                                  self.n_procs)

    def _feed_images(self, arr):
        return self._feed(arr, self.layout.batch())

    def _feed_labels(self, arr):
        return self._feed(arr, self.layout.labels(), batch_axis=1)

    def _feed_vec(self, arr):
        return self._feed(arr, self.layout.batch())

    # -- validation ---------------------------------------------------------

    def validate(self, state: TrainState, eval_step_fn) -> dict:
        batcher = self._batcher(self.tp.val_shards, self.tp.val_labels,
                                shuffle=False, seed=0)
        isn = self.config.model_params.scene_gating
        losses = []
        scene_correct = scene_total = 0
        gcd = GcdAccumulator()
        for batch in batcher:
            if isn:
                scene = batch.scene if batch.scene is not None \
                    else np.full(batch.images.shape[0], -1, np.int32)
                metrics, logits = eval_step_fn(
                    state, self._feed_images(batch.images),
                    self._feed_labels(batch.labels),
                    self._feed_vec(scene),
                )
                scene_correct += int(metrics["scene_correct"])
                scene_total += int(metrics["scene_total"])
            else:
                metrics, logits = eval_step_fn(
                    state, self._feed_images(batch.images),
                    self._feed_labels(batch.labels),
                )
            losses.append(float(metrics["val_loss"]))
            if batch.latlng is not None:
                _, plat, plng = predict_hierarchical(list(logits),
                                                     self.harrays)
                known = ~np.isnan(batch.latlng[:, 0])
                # multi-process: known.any() may differ per host — the
                # device counts must still be computed in lockstep
                if known.any() or self.n_procs > 1:
                    counts, total = gcd_threshold_counts(
                        plat, plng,
                        self._feed_vec(batch.latlng[:, 0]),
                        self._feed_vec(batch.latlng[:, 1]),
                        valid=self._feed_vec(known),
                    )
                    gcd.update(counts, total)
        out = {"val_loss": float(np.mean(losses)) if losses else float("nan")}
        if scene_total:
            out["scene_acc"] = scene_correct / scene_total
        if gcd.total:
            out.update({f"gcd@{int(k)}km": v for k, v in gcd.result().items()})
        return out

    # -- main loop ----------------------------------------------------------

    def fit(self, max_steps: Optional[int] = None, resume: bool = True):
        tp = self.tp
        steps_per_epoch = tp.steps_per_epoch
        if steps_per_epoch is None:
            from ..data.shards import count_records

            n = count_records(tp.train_shards)
            steps_per_epoch = max(1, n // tp.batch_size)
            self.log(f"{n} training records -> {steps_per_epoch} steps/epoch")
        total_steps = max_steps or steps_per_epoch * tp.epochs

        state = self.initial_state(steps_per_epoch)
        if resume:
            state = self.maybe_resume(state)
        start_step = int(state.step)

        isn = self.config.model_params.scene_gating
        if isn:
            from .step import make_jitted_isn_train_step

            train_fn = make_jitted_isn_train_step(
                self.layout,
                label_smoothing=tp.label_smoothing,
                crop=tp.image_size,
                dtype=self.model.dtype,
                scene_loss_weight=tp.scene_loss_weight,
                crop_scale=tuple(tp.train_crop_scale)
                if tp.train_crop_scale else None,
            )
        else:
            train_fn = make_jitted_train_step(
                self.layout,
                label_smoothing=tp.label_smoothing,
                crop=tp.image_size,
                dtype=self.model.dtype,
                crop_scale=tuple(tp.train_crop_scale)
                if tp.train_crop_scale else None,
            )
        if isn:
            from .step import make_jitted_isn_eval_step

            eval_fn = make_jitted_isn_eval_step(
                self.layout, crop=tp.image_size, dtype=self.model.dtype
            )
        else:
            eval_fn = make_jitted_eval_step(self.layout, crop=tp.image_size,
                                            dtype=self.model.dtype)
        from ..parallel.multihost import global_put_tree

        rng = global_put_tree(jax.random.PRNGKey(tp.seed),
                              self.layout.replicated())

        if tp.profile_dir:
            jax.profiler.start_trace(tp.profile_dir)
        step = start_step
        t0 = time.time()
        images_seen = 0

        # Preemption safety (SURVEY.md §5 failure detection): checkpoint on
        # SIGTERM so a maintenance event or scheduler kill resumes cleanly.
        import signal

        self._interrupted = False

        def _on_sigterm(signum, frame):
            self._interrupted = True
            self.log("SIGTERM received; checkpointing at next step")

        old_handler = None
        try:
            old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not the main thread (tests)
        try:
            while step < total_steps:
                epoch_start_step = step
                batcher = self._batcher(
                    tp.train_shards, tp.train_labels, shuffle=True,
                    seed=tp.seed + step,
                )
                for batch in batcher:
                    if isn:
                        scene = batch.scene if batch.scene is not None \
                            else np.full(batch.images.shape[0], -1, np.int32)
                        state, metrics = train_fn(
                            state, self._feed_images(batch.images),
                            self._feed_labels(batch.labels),
                            self._feed_vec(scene), rng,
                        )
                    else:
                        state, metrics = train_fn(
                            state, self._feed_images(batch.images),
                            self._feed_labels(batch.labels), rng,
                        )
                    step += 1
                    images_seen += batch.images.shape[0] * self.n_procs
                    if step % tp.log_every_steps == 0 or step == total_steps:
                        loss = float(metrics["loss"])
                        dt = time.time() - t0
                        ips = images_seen / dt if dt > 0 else 0
                        lr = float(self.schedule(step))
                        self.log(
                            f"step {step}/{total_steps} loss {loss:.4f} "
                            f"lr {lr:.5f} {ips:.1f} img/s"
                        )
                        self.metrics.log(step, {"loss": loss, "lr": lr,
                                                "images_per_sec": ips},
                                         prefix="train/")
                    do_ckpt = (tp.checkpoint_every_steps and
                               step % tp.checkpoint_every_steps == 0)
                    do_val = (tp.val_every_steps and
                              step % tp.val_every_steps == 0)
                    if do_ckpt:
                        # _checkpoint runs (and logs) validation itself, so
                        # a coinciding val_every_steps boundary must not run
                        # the full val set a second time
                        self._checkpoint(state, step, eval_fn)
                    elif do_val:
                        self.log(f"val @ {step}: "
                                 f"{self.validate(state, eval_fn)}")
                    if self._interrupted:
                        self._checkpoint(state, step, eval_fn,
                                         val_metrics={})
                        self.ckpt.wait()
                        self.log(f"checkpointed at step {step} after "
                                 "SIGTERM; exiting")
                        return state
                    if step >= total_steps:
                        break
                else:
                    if step == epoch_start_step:
                        # zero batches produced: every record was dropped
                        # (e.g. label CSV ids don't match the shards) —
                        # fail loudly instead of spinning forever.
                        raise RuntimeError(
                            "training epoch produced no batches — check "
                            "that the label CSV IMG_IDs match the shard "
                            "record ids and that shards decode"
                        )
                    # epoch boundary: validate + checkpoint
                    val = self.validate(state, eval_fn) \
                        if self.tp.val_shards else {}
                    if val:
                        self.log(f"epoch end @ {step}: {val}")
                    self._checkpoint(state, step, eval_fn, val_metrics=val)
        finally:
            if tp.profile_dir:
                jax.profiler.stop_trace()
            if old_handler is not None:
                try:
                    signal.signal(signal.SIGTERM, old_handler)
                except ValueError:
                    pass
        self._checkpoint(state, step, eval_fn)
        self.ckpt.wait()
        return state

    def _checkpoint(self, state, step, eval_fn, val_metrics=None):
        if val_metrics is None:
            val_metrics = self.validate(state, eval_fn) \
                if self.tp.val_shards else {}
            if val_metrics:
                self.log(f"val @ {step}: {val_metrics}")
        if val_metrics:
            self.metrics.log(step, val_metrics, prefix="val/")
        # metric-less saves (no validation ran) are exempt from best-N
        # cleanup — see CheckpointManager.save
        metrics = (
            {"val_loss": val_metrics["val_loss"]}
            if "val_loss" in val_metrics else None
        )
        from ..parallel.multihost import host_local_tree

        # every process participates: the fetch may all-gather leaves
        # sharded across hosts (a collective), and orbax's multihost
        # coordination expects save() on all processes (its internal
        # barriers would deadlock a lone writer). Only the hparams
        # snapshot is host-0-only (plain file write, no barrier).
        host_state = {
            "params": host_local_tree(state.params),
            "batch_stats": host_local_tree(state.batch_stats),
            "opt_state": host_local_tree(state.opt_state),
            "step": step,
        }
        self.ckpt.save(
            step,
            host_state,
            metrics=metrics,
            config=self.config if self.proc_id == 0 else None,
        )
