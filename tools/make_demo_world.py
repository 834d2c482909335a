"""Generate a self-contained synthetic demo world.

Creates everything a user needs to exercise the full pipeline without the
(unavailable) MP-16/Im2GPS downloads: clustered coordinates, the three
partitionings, msgpack training shards of synthetic JPEGs, label CSVs with
scene columns, an eval image folder + meta CSV, and a ready-to-run config.

Usage:
  python tools/make_demo_world.py --output /tmp/demo_world [--n_train 512]
Then:
  python -m classification.train_base --config /tmp/demo_world/demo.yml --max_steps 20
  python -m classification.inference --checkpoint /tmp/demo_world/ckpt \
      --image_dir /tmp/demo_world/eval_images
  python -m classification.test --checkpoint /tmp/demo_world/ckpt \
      --image_dirs /tmp/demo_world/eval_images \
      --meta_files /tmp/demo_world/eval_meta.csv
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import yaml
from PIL import Image

CITIES = [
    (48.8566, 2.3522),     # Paris
    (40.7128, -74.0060),   # NYC
    (35.6762, 139.6503),   # Tokyo
    (-33.8688, 151.2093),  # Sydney
]


def jpeg_bytes(rng, w=320, h=280):
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=88)
    return buf.getvalue()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True)
    p.add_argument("--n_train", type=int, default=512)
    p.add_argument("--n_eval", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from geoestimation_tpu.data import shards
    from geoestimation_tpu.geo import assign_classes, create_cells

    rng = np.random.default_rng(args.seed)
    root = os.path.abspath(args.output)
    os.makedirs(root, exist_ok=True)

    # coordinates: clusters + noise
    def sample(n):
        lats, lngs = [], []
        for i in range(n):
            clat, clng = CITIES[i % len(CITIES)]
            lats.append(clat + rng.normal(0, 0.4))
            lngs.append(clng + rng.normal(0, 0.4))
        return np.array(lats), np.array(lngs)

    # dense coordinate set for building partitionings
    plat, plng = sample(6000)
    cells_dir = os.path.join(root, "resources", "s2_cells")
    files = []
    parts = []
    for img_max, fn in [(3000, "cells_50_5000.csv"),
                        (1000, "cells_50_2000.csv"),
                        (400, "cells_50_1000.csv")]:
        res = create_cells(plat, plng, img_min=10, img_max=img_max)
        path = os.path.join(cells_dir, fn)
        res.partitioning.to_csv(path)
        files.append(path)
        parts.append(res.partitioning)
        print(f"{fn}: {len(res.partitioning)} cells")

    # training shards + labels
    tlat, tlng = sample(args.n_train)
    labels = assign_classes(tlat, tlng, parts)
    rows = []
    per_shard = max(64, args.n_train // 4)
    for s in range(0, args.n_train, per_shard):
        recs = []
        for i in range(s, min(s + per_shard, args.n_train)):
            img_id = f"train_{i:05d}"
            recs.append({"id": img_id, "image": jpeg_bytes(rng),
                         "lat": float(tlat[i]), "lng": float(tlng[i])})
            rows.append((img_id, labels[0, i], labels[1, i], labels[2, i],
                         i % 3))
        shards.write_shard(
            recs,
            os.path.join(root, "shards", f"shard_{s // per_shard:05d}.msgpack"),
        )
    pd.DataFrame(
        rows, columns=["IMG_ID", "coarse", "middle", "fine", "S3_Label"]
    ).to_csv(os.path.join(root, "train_labels.csv"), index=False)

    # eval images + meta
    eval_dir = os.path.join(root, "eval_images")
    os.makedirs(eval_dir, exist_ok=True)
    elat, elng = sample(args.n_eval)
    meta = []
    for i in range(args.n_eval):
        img_id = f"eval_{i:04d}.jpg"
        with open(os.path.join(eval_dir, img_id), "wb") as f:
            f.write(jpeg_bytes(rng))
        meta.append((img_id, float(elat[i]), float(elng[i])))
    pd.DataFrame(meta, columns=["IMG_ID", "LAT", "LON"]).to_csv(
        os.path.join(root, "eval_meta.csv"), index=False
    )

    # config
    config = {
        "model_params": {
            "arch": "resnet50",
            "dtype": "bfloat16",
            "partitionings": {
                "shortnames": ["coarse", "middle", "fine"],
                "files": files,
            },
        },
        "train_params": {
            "batch_size": 16,
            "epochs": 2,
            "optimizer": {"name": "sgd", "lr": 0.01, "momentum": 0.9,
                          "weight_decay": 0.0001},
            "lr_schedule": {"name": "multistep", "milestones": [1],
                            "gamma": 0.5},
            "train_shards": [os.path.join(root, "shards", "*.msgpack")],
            "val_shards": [os.path.join(root, "shards",
                                        "shard_00000.msgpack")],
            "train_labels": os.path.join(root, "train_labels.csv"),
            "num_workers": 4,
            "checkpoint_dir": os.path.join(root, "ckpt"),
            "checkpoint_every_steps": 0,
            "log_every_steps": 5,
            "image_size": 224,
        },
    }
    cfg_path = os.path.join(root, "demo.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
    print(f"demo world ready: {root}\n  config: {cfg_path}")


if __name__ == "__main__":
    main()
