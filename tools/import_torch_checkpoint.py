"""Import a reference-style PyTorch checkpoint into this framework.

The reference shipped `epoch=014-val_loss=18.4833.ckpt` (+ hparams.yaml) —
a PyTorch Lightning checkpoint of a torchvision ResNet50 with one Linear
head per partitioning (reference README.md:93-96; SURVEY.md §3.1
train_base row). Users migrating from the reference may still hold such
files; this tool converts them to an orbax checkpoint consumable by
`classification.inference` / `classification.test`, giving accuracy parity
without retraining.

Handles: Lightning wrapping ('state_dict' + 'model.' prefixes), torchvision
parameter layout (OIHW conv kernels -> HWIO; Linear (out,in) -> (in,out)),
BatchNorm running stats, and any naming of the per-partitioning Linear
heads (matched by shape against the partitioning class counts).

Usage:
  python tools/import_torch_checkpoint.py \
      --torch_ckpt epoch=014-val_loss=18.4833.ckpt \
      --cell_files cells_50_5000.csv cells_50_2000.csv cells_50_1000.csv \
      --output models/base_M_imported [--arch resnet50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from geoestimation_tpu.models.resnet import STAGE_SIZES


def load_torch_state_dict(path):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_prefixes(sd):
    """Remove common wrappers: 'model.', 'module.', 'net.'."""
    def strip(k):
        for p in ("model.", "module.", "net.", "backbone."):
            if k.startswith(p):
                return strip(k[len(p):])
        return k

    return {strip(k): v for k, v in sd.items()}


def convert_backbone(sd, arch):
    """torchvision resnet keys -> our Flax param/batch_stats trees."""
    params = {}
    stats = {}

    def conv(k):
        return np.transpose(sd[k], (2, 3, 1, 0)).astype(np.float32)

    def bn(prefix):
        p = {"scale": sd[f"{prefix}.weight"].astype(np.float32),
             "bias": sd[f"{prefix}.bias"].astype(np.float32)}
        s = {"mean": sd[f"{prefix}.running_mean"].astype(np.float32),
             "var": sd[f"{prefix}.running_var"].astype(np.float32)}
        return p, s

    params["conv1"] = {"kernel": conv("conv1.weight")}
    params["bn1"], stats["bn1"] = bn("bn1")

    for stage, n_blocks in enumerate(STAGE_SIZES[arch]):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_block{b}"
            blk_p, blk_s = {}, {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = {"kernel": conv(f"{src}.conv{ci}.weight")}
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bn(f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": conv(f"{src}.downsample.0.weight")
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(
                    f"{src}.downsample.1"
                )
            params[dst] = blk_p
            stats[dst] = blk_s
    return params, stats


def find_heads(sd, n_classes):
    """Locate per-partitioning Linear heads by output shape, in the order
    of `n_classes`. Returns (kernel (feat, sum), bias (sum,))."""
    # candidates: 2D weights with in_features == 2048-like and matching out
    candidates = {}
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 2:
            base = k[:-len(".weight")]
            bias = sd.get(base + ".bias")
            candidates.setdefault(v.shape[0], []).append((base, v, bias))

    kernels, biases = [], []
    for n in n_classes:
        if n not in candidates or not candidates[n]:
            raise KeyError(
                f"no Linear head with {n} outputs in checkpoint; "
                f"2D weight shapes present: "
                f"{sorted({v.shape for _, v, _ in sum(candidates.values(), [])})}"
            )
        # take them in encounter order (ModuleList order == partitioning
        # order in the reference)
        base, w, b = candidates[n].pop(0)
        kernels.append(np.transpose(w).astype(np.float32))  # (in, out)
        biases.append((b if b is not None else np.zeros(n)).astype(np.float32))
    return np.concatenate(kernels, axis=1), np.concatenate(biases)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--cell_files", nargs="+", required=True,
                   help="partitioning CSVs, coarse -> fine")
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    p.add_argument("--arch", default="resnet50", choices=list(STAGE_SIZES))
    args = p.parse_args(argv)

    from geoestimation_tpu.geo import load_partitionings
    from geoestimation_tpu.train.checkpoint import save_single
    from geoestimation_tpu.utils.config import Config

    parts = load_partitionings(args.cell_files)
    n_classes = [len(pt) for pt in parts]
    print(f"partitionings: {[pt.name for pt in parts]} -> {n_classes}")

    sd = strip_prefixes(load_torch_state_dict(args.torch_ckpt))
    bb_params, bb_stats = convert_backbone(sd, args.arch)
    head_kernel, head_bias = find_heads(sd, n_classes)
    print(f"backbone tensors: {sum(1 for _ in _walk(bb_params))}; "
          f"fused head: {head_kernel.shape}")

    state = {
        "params": {
            "backbone": bb_params,
            "heads": {"fused_head": {"kernel": head_kernel,
                                     "bias": head_bias}},
        },
        "batch_stats": {"backbone": bb_stats},
        "opt_state": {},
        "step": 0,
    }
    config = Config()
    config.model_params.arch = args.arch
    config.model_params.partitionings.files = [
        os.path.abspath(f) for f in args.cell_files
    ]
    save_single(args.output, state, config=config, step=0,
                metrics={"val_loss": 0.0})
    print(f"wrote orbax checkpoint to {args.output}")


def _walk(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v


if __name__ == "__main__":
    main()
