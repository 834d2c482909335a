"""Device mesh and sharding layout.

The reference's only parallelism was PyTorch-DDP data parallel via
Lightning Trainer flags (SURVEY.md §3.3). The TPU-native equivalent is a
`jax.sharding.Mesh` with a `data` axis (batch-sharded inputs, replicated
params; XLA inserts the gradient psum over ICI) plus an optional `model`
axis for sharding the fused classification head's output dimension — with
~23k fused classes the head matmul (2048 x 23k) and its gradients are the
only tensors big enough to benefit. On one chip the mesh is (1, 1) and
everything compiles away.

Multi-slice: pass `dcn_data` > 1 to put an outer data axis on DCN (slices),
keeping the inner data axis on ICI — gradient all-reduce then hierarchically
reduces intra-slice first (XLA does this automatically for a 2-level mesh
built with create_hybrid_device_mesh).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass
class MeshLayout:
    mesh: Mesh

    @property
    def n_data(self):
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self):
        return self.mesh.shape[MODEL_AXIS]

    # -- shardings ----------------------------------------------------------

    def batch(self) -> NamedSharding:
        """Leading-axis (batch) sharding for inputs/labels."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def labels(self) -> NamedSharding:
        """(P, B) label tensors: batch is axis 1."""
        return NamedSharding(self.mesh, P(None, DATA_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def head_kernel(self, n_total: Optional[int] = None) -> NamedSharding:
        """Fused head kernel (feat, total_classes).

        Class dim on the model axis when it divides evenly; otherwise
        the FEATURE dim (2048 — divisible by any sane model axis) so
        the real 23393-class flagship head (odd total! XLA/JAX reject
        uneven shardings outright) still distributes its 191 MB kernel
        + momentum. Feature-dim sharding turns the head matmul into a
        contraction-sharded product — XLA inserts one logits psum over
        the model axis."""
        if n_total is not None and n_total % self.n_model:
            return NamedSharding(self.mesh, P(MODEL_AXIS, None))
        return NamedSharding(self.mesh, P(None, MODEL_AXIS))

    def head_bias(self, n_total: Optional[int] = None) -> NamedSharding:
        """Bias rides the class axis only when it divides evenly;
        otherwise replicated (it is ~4 bytes/class — negligible)."""
        if n_total is not None and n_total % self.n_model:
            return self.replicated()
        return NamedSharding(self.mesh, P(MODEL_AXIS))

    def params(self, params) -> "jax.tree_util.PyTreeDef":
        """Sharding tree for the model params: everything replicated except
        the fused head, whose class dimension rides the model axis
        (feature dimension for class counts the mesh cannot split
        evenly — see head_kernel).

        Also correct for optimizer-state trees (e.g. SGD momentum): optax
        states embed the param tree, so each momentum leaf's key path
        contains the same `fused_head` component and gets the same
        placement as its param — avoiding a per-step reshard of the
        largest tensor's momentum (the 2048 x ~23.4k head kernel)."""
        def assign(path, leaf):
            names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
            if "fused_head" in names:
                if leaf.ndim == 2:
                    return self.head_kernel(n_total=leaf.shape[1])
                if leaf.ndim == 1:
                    return self.head_bias(n_total=leaf.shape[0])
            return self.replicated()

        return jax.tree_util.tree_map_with_path(assign, params)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    dcn_data: int = 1,
) -> MeshLayout:
    """Build the (data, model) mesh over available devices.

    n_data=None uses all remaining devices on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        if total % n_model:
            raise ValueError(f"{total} devices not divisible by model={n_model}")
        n_data = total // n_model
    if n_data * n_model != total:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {total} devices"
        )
    if dcn_data > 1:
        if n_data % dcn_data:
            raise ValueError(
                f"data axis {n_data} not divisible by dcn_data={dcn_data}"
            )
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        if None not in slice_ids and len(slice_ids) == dcn_data:
            # Real multi-slice topology: let jax order devices so the outer
            # data axis crosses slices (DCN) and the inner rides ICI.
            mesh_devices = mesh_utils.create_hybrid_device_mesh(
                (n_data // dcn_data, n_model),
                dcn_mesh_shape=(dcn_data, 1),
                devices=devices,
            ).reshape(n_data, n_model)
        else:
            # Virtual slices (CPU test substrate, or dcn_data used to
            # emulate a hierarchy on one slice): contiguous groups in
            # enumeration order. The logical mesh and all shardings are
            # identical to the hardware case; only the physical transport
            # assignment differs, which only exists on real multi-slice
            # hardware.
            mesh_devices = np.array(devices).reshape(n_data, n_model)
    else:
        mesh_devices = mesh_utils.create_device_mesh(
            (n_data, n_model), devices=devices
        )
    return MeshLayout(mesh=Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS)))


def shard_batch_arrays(layout: MeshLayout, images, labels=None):
    """Place host numpy batch arrays onto the mesh with batch sharding."""
    images = jax.device_put(images, layout.batch())
    if labels is None:
        return images
    labels = jax.device_put(labels, layout.labels())
    return images, labels
