"""Multi-process (multi-host) runtime.

The reference scaled multi-GPU via Lightning's DDP launcher (SURVEY.md
§3.3); pods of TPUs scale via JAX's multi-controller runtime instead:
every host runs the SAME program, `jax.distributed.initialize` wires the
processes into one cluster, each host feeds the process-local portion of
the global batch, and the jitted GSPMD step (train/step.py) runs over
the global mesh exactly as in the single-controller case — same
shardings, same collectives, no code change in the step itself.

Pieces:
  * `initialize(...)` — thin wrapper over `jax.distributed.initialize`
    (called by `classification.train_base --coordinator ...` before any
    backend touch).
  * `LockstepSlicer` — input-feed mode where every host reads the full
    shard stream, materializes IDENTICAL global batches (same shuffle
    seed => same permutation), and keeps only its process-local slice.
    Each host pays global-batch decode cost (the batch is decoded before
    slicing); in exchange the semantics are EXACTLY the single-host
    loader's
    (padding, masking, drop rules — all inherited), every host produces
    the same number of batches (no collective deadlock on uneven
    shards), and 2-process training is bit-comparable to 1-process
    training on the same data. For big fleets where decode dominates,
    set `train_params.data_feed: strided` (`StridedFeed` below): each
    host reads only `shards[p::n]` and decodes only its local rows —
    IO/decode 1/N, at the cost of exact batch composition.
  * `global_batch_array(...)` — process-local numpy -> global
    `jax.Array` via `jax.make_array_from_process_local_data`.
  * `host_local_tree(...)` — checkpoint-side inverse: fetch a (possibly
    cross-process-sharded) pytree to host numpy, all-gathering the
    leaves this process cannot address.

TPU-pod launch (one command per host, e.g. via gcloud --worker=all):

  python -m classification.train_base --config config/baseM.yml \
      --coordinator ${LEADER_IP}:8476 \
      --num_processes ${N_HOSTS} --process_id ${TPU_WORKER_ID}

On Cloud TPU VMs `jax.distributed.initialize()` can infer all three
from the metadata server; flags override for bare-metal/CPU clusters.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None):
    """Join (or form) the multi-process JAX cluster. Must run before any
    jax backend use. No-op wrapper kept thin so CLIs import lazily."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def add_coordinator_args(parser, extra_help=""):
    """The shared multi-process flag trio, identical across
    classification.{train_base,inference,test} (one definition so a new
    flag or validation lands everywhere at once)."""
    parser.add_argument(
        "--coordinator", default=None,
        help="multi-process runtime: coordinator host:port (launch one "
             "process per host with its own --process_id), or 'auto' "
             "for Cloud TPU metadata autodetection; see "
             f"docs/MULTIHOST.md. {extra_help}".strip())
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def maybe_initialize(args):
    """Wire jax.distributed from `add_coordinator_args` flags. No-op
    without --coordinator; orphan --num_processes/--process_id (which
    would otherwise be silently ignored) are rejected."""
    if not args.coordinator:
        if args.num_processes is not None or args.process_id is not None:
            raise SystemExit(
                "--num_processes/--process_id require --coordinator")
        return
    if args.coordinator == "auto":
        initialize()  # Cloud TPU metadata autodetection
    else:
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)


class LockstepSlicer:
    """Wrap a batcher that yields identical GLOBAL batches on every host
    (same shards, same seed, host_count=1) and emit this process's
    contiguous slice of each.

    The slice is contiguous rows [p*local : (p+1)*local] — matching how
    `global_batch_array` reassembles rows across processes (process-
    contiguous data axis, asserted by `Trainer` when it builds the
    mesh)."""

    def __init__(self, batcher, process_id: int, process_count: int):
        if batcher.batch_size % process_count:
            raise ValueError(
                f"global batch {batcher.batch_size} not divisible by "
                f"{process_count} processes")
        self.batcher = batcher
        self.p = process_id
        self.n = process_count
        self.local = batcher.batch_size // process_count

    def __iter__(self):
        import dataclasses

        lo = self.p * self.local
        hi = lo + self.local
        for b in self.batcher:
            yield dataclasses.replace(
                b,
                images=b.images[lo:hi],
                labels=b.labels[:, lo:hi],
                ids=None if b.ids is None else b.ids[lo:hi],
                latlng=None if b.latlng is None else b.latlng[lo:hi],
                scene=None if b.scene is None else b.scene[lo:hi],
            )


class StridedFeed:
    """Per-host shard-subset feed (`train_params.data_feed: strided`):
    each process reads only its shard subset (`shards[p::n]`, data/
    shards.py iter_records) and decodes only its LOCAL rows — IO+decode
    cost 1/N of lockstep — at the price of global batch composition
    differing from a single-process run (rows pair by arrival order,
    not by a shared global permutation).

    Uneven shard subsets would hand hosts different batch counts and
    deadlock the first collective of the odd step; every yield is
    therefore gated on a tiny all-gather of a have-next bit and the
    stream ends GLOBALLY as soon as any host runs dry (richer hosts
    drop at most their trailing local batches of the epoch)."""

    def __init__(self, batcher):
        self.batcher = batcher
        self.batch_size = batcher.batch_size

    def __iter__(self):
        from jax.experimental import multihost_utils

        it = iter(self.batcher)
        while True:
            err = None
            try:
                b = next(it)
            except StopIteration:
                b = None
            except Exception as e:  # decode/IO failure on THIS host
                # still vote have=False so the peers exit their
                # all-gather cleanly instead of hanging to the
                # distributed-runtime timeout; re-raise locally after
                # the sync so the failure is visible where it happened
                b, err = None, e
            have = multihost_utils.process_allgather(
                np.asarray(b is not None))
            if err is not None:
                raise err
            if not bool(np.all(have)):
                return
            yield b


def global_batch_array(sharding, local_arr: np.ndarray, batch_axis: int,
                       process_count: int):
    """Process-local rows -> one global jax.Array on the mesh."""
    import jax

    if process_count == 1:
        return jax.device_put(np.asarray(local_arr), sharding)
    gshape = list(local_arr.shape)
    gshape[batch_axis] *= process_count
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_arr), tuple(gshape))


def data_axis_is_process_contiguous(mesh, axis: str = "data") -> bool:
    """True iff walking the mesh's data axis visits processes in
    non-decreasing, contiguous blocks — the layout `LockstepSlicer`'s
    contiguous row slices assume."""
    devs = np.moveaxis(
        mesh.devices, list(mesh.axis_names).index(axis), 0)
    procs = [d.process_index for d in devs.reshape(devs.shape[0], -1)[:, 0]]
    seen = []
    for p in procs:
        if not seen or seen[-1] != p:
            if p in seen:
                return False
            seen.append(p)
    return True


def global_put_tree(tree, shardings):
    """Host pytree -> global jax.Arrays for the given shardings, working
    in BOTH runtimes. Single-process: plain device_put. Multi-process:
    `jax.make_array_from_callback` (each process supplies the data for
    its addressable shards; device_put cannot target non-addressable
    devices)."""
    import jax

    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, tree, shardings)

    def put(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s,
                                            lambda idx: arr[idx])

    return jax.tree.map(put, tree, shardings)


def merge_gcd_accumulators(accs: dict, n_missing: int = 0) -> int:
    """Cross-process reduction for multi-process evaluation: sum every
    process's GCD threshold counts/totals (eval/metrics.GcdAccumulator
    is count-based precisely so shards can be summed) into each
    accumulator IN PLACE, and return the summed images-without-meta
    count. All processes must call this in lockstep with the same key
    set (the engine pre-creates an accumulator per pred_key, so an
    idle process with an empty file slice still participates)."""
    from jax.experimental import multihost_utils

    keys = sorted(accs)
    t = len(next(iter(accs.values())).counts)
    local = np.concatenate(
        [np.concatenate([accs[k].counts, [accs[k].total]]) for k in keys]
        + [[n_missing]]
    ).astype(np.int64)
    summed = np.asarray(
        multihost_utils.process_allgather(local)
    ).reshape(-1, local.shape[0]).sum(axis=0)
    off = 0
    for k in keys:
        accs[k].counts = summed[off:off + t]
        accs[k].total = int(summed[off + t])
        off += t + 1
    return int(summed[-1])


def host_local_tree(tree):
    """Pytree of jax.Arrays -> host numpy on EVERY process.

    Fully-replicated and process-local leaves fetch directly; a leaf
    sharded across processes (e.g. a model-axis fused head on a
    cross-host mesh) is re-replicated with a jitted identity whose
    out_sharding is P() — an all-gather collective, so ALL processes
    must call this in lockstep."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    def fetch(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_replicated or x.is_fully_addressable:
            return np.asarray(x)
        mesh = x.sharding.mesh
        rep = jax.jit(lambda a: a,
                      out_shardings=NamedSharding(mesh, PartitionSpec()))
        return np.asarray(rep(x))

    return jax.tree.map(fetch, tree)
