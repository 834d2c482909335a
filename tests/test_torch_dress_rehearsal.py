"""Accuracy-parity dress rehearsal: torch ckpt -> import -> full CLI path.

VERDICT r1 missing #3 / next #8: prove that an imported reference-style
checkpoint produces the SAME accuracy table through `classification.test`
that the torch stack itself computes — extending the single-forward parity
test (test_torch_import.py) to the complete user-visible path:

  torch "training" (real SGD + live BN stats) on a synthetic world
    -> Lightning-style .ckpt (state_dict + 'model.' prefixes)
    -> tools/import_torch_checkpoint CLI (orbax checkpoint + hparams)
    -> python -m classification.test --exact_tta --tta_fold prob_mean
    == an independent torch-side eval stack (PIL decode, torchvision
       Resize/TenCrop semantics, softmax-prob mean, f* rule, haversine
       GCD thresholds) computed in this file.

The torch side re-implements decode/TTA/fold/metrics from the documented
torchvision semantics (Resize floor-scales the long side; TenCrop = 4
corners + center + horizontal flips) rather than importing this package's
ingest code, so the comparison exercises our host `--exact_tta` path
against an independent realization. The S2 hierarchy gather maps are the
one shared component (they derive from the same cell CSVs either way and
carry their own oracle tests, tests/test_s2_groundtruth.py / test_geo.py).

Uses the resnet14 layout (full stem/4-stage/downsample/head topology) to
keep CPU runtime sane; resnet50-layout weight-mapping parity is covered by
tests/test_torch_import.py.
"""

import io
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import import_torch_checkpoint as imp  # noqa: E402

ARCH = "resnet14"
STAGES = (1, 1, 1, 1)
N_EVAL = 8
THRESHOLDS = (1.0, 25.0, 200.0, 750.0, 2500.0)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# torch-side model (torchvision parameter layout), trainable
# ---------------------------------------------------------------------------


def make_torch_params(n_classes, stages=STAGES, rng=None):
    # Per-call RNG: a module-level shared generator made each test's
    # weights depend on how many draws EARLIER tests consumed (suite
    # order), which round 3 shipped as an order-dependent flake.
    rng = rng if rng is not None else np.random.default_rng(42)

    def t(shape, scale=0.05, grad=True):
        x = torch.tensor(rng.normal(0, scale, shape).astype(np.float32))
        x.requires_grad_(grad)
        return x

    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t((c,), 0.2)
        with torch.no_grad():
            sd[f"{prefix}.weight"] += 1.0
        sd[f"{prefix}.bias"] = t((c,), 0.1)
        sd[f"{prefix}.running_mean"] = torch.zeros(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)

    sd["conv1.weight"] = t((64, 3, 7, 7))
    add_bn("bn1", 64)
    cin = 64
    for stage, n_blocks in enumerate(stages):
        cmid = 64 * (2 ** stage)
        cout = cmid * 4
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            sd[f"{p}.conv1.weight"] = t((cmid, cin, 1, 1))
            add_bn(f"{p}.bn1", cmid)
            sd[f"{p}.conv2.weight"] = t((cmid, cmid, 3, 3))
            add_bn(f"{p}.bn2", cmid)
            sd[f"{p}.conv3.weight"] = t((cout, cmid, 1, 1))
            add_bn(f"{p}.bn3", cout)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = t((cout, cin, 1, 1))
                add_bn(f"{p}.downsample.1", cout)
            cin = cout
    for i, n in enumerate(n_classes):
        sd[f"classifier.{i}.weight"] = t((n, 2048))
        sd[f"classifier.{i}.bias"] = t((n,), 0.1)
    return sd


def torch_forward(sd, x, training=False, stages=STAGES):
    import torch.nn.functional as F

    def bn(v, p):
        return F.batch_norm(
            v, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], training=training,
            momentum=0.1, eps=1e-5,
        )

    v = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    v = F.relu(bn(v, "bn1"))
    v = F.max_pool2d(v, 3, stride=2, padding=1)
    for stage, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            stride = 2 if stage > 0 and b == 0 else 1
            res = v
            y = F.relu(bn(F.conv2d(v, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
            y = F.relu(bn(F.conv2d(y, sd[f"{p}.conv2.weight"],
                                   stride=stride, padding=1), f"{p}.bn2"))
            y = bn(F.conv2d(y, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            if f"{p}.downsample.0.weight" in sd:
                res = bn(F.conv2d(v, sd[f"{p}.downsample.0.weight"],
                                  stride=stride), f"{p}.downsample.1")
            v = F.relu(y + res)
    feats = v.mean(dim=(2, 3))
    n_heads = len([k for k in sd if k.startswith("classifier.")
                   and k.endswith(".weight")])
    return [
        feats @ sd[f"classifier.{i}.weight"].T + sd[f"classifier.{i}.bias"]
        for i in range(n_heads)
    ]


def color_targets(parts):
    """Per head, the class whose cell center is nearest each of three
    Paris-region anchors — so the color->class mapping the net learns
    points at geographically sensible cells and the GCD tables get a
    spread of hits and misses (not all-zero, not saturated)."""
    anchors = [(48.2, 2.0), (48.8, 2.4), (49.2, 3.0)]
    return [
        [int(np.argmin((p.lat - la) ** 2 + (p.lng - ln) ** 2))
         for la, ln in anchors]
        for p in parts
    ]


def train_torch(sd, n_classes, targets=None, steps=5, batch=4, size=96,
                stages=STAGES, rng=None):
    """Real SGD steps (live BN running-stat updates). Default: random
    data/labels — the point is a checkpoint whose BN statistics and
    heads are not at init. With `targets` (per-head class per color
    class, see color_targets): training data has the eval images'
    dominant-color structure so the checkpoint produces DECISIVE logits
    on the eval set — the int8 leg needs that, because near-tie
    argmaxes flip under any precision change."""
    import torch.nn.functional as F

    rng = rng if rng is not None else np.random.default_rng(43)
    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)
    params = [v for v in sd.values() if v.requires_grad]
    opt = torch.optim.SGD(params, lr=0.02, momentum=0.9)
    for step in range(steps):
        if targets is None:
            x = torch.tensor(
                rng.normal(0, 1, (batch, 3, size, size)).astype(
                    np.float32))
            labels = [
                torch.tensor(rng.integers(0, n, batch).astype(np.int64))
                for n in n_classes
            ]
        else:
            cls = rng.integers(0, 3, batch)
            u8 = np.zeros((batch, 3, size, size), np.float32)
            for b, c in enumerate(cls):
                u8[b, c] = 180.0
                u8[b, (c + 1) % 3] = 60.0
            u8 = np.clip(u8 + rng.normal(0, 40, u8.shape), 0,
                         255).astype(np.float32)
            x = torch.tensor((u8 / 255.0 - mean) / std)
            labels = [
                torch.tensor(np.asarray([t[c] for c in cls], np.int64))
                for t in targets
            ]
        logits = torch_forward(sd, x, training=True, stages=stages)
        loss = sum(F.cross_entropy(lg, lb) for lg, lb in zip(logits, labels))
        opt.zero_grad()
        loss.backward()
        opt.step()


# ---------------------------------------------------------------------------
# torch-side eval stack (torchvision semantics, implemented independently)
# ---------------------------------------------------------------------------


def pil_tencrop(path, resize_to=256, crop=224):
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w <= h:  # torchvision Resize(int): floor-scale the long side
        nw, nh = resize_to, int(resize_to * h / w)
    else:
        nw, nh = int(resize_to * w / h), resize_to
    arr = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.uint8)
    cc_t, cc_l = (nh - crop) // 2, (nw - crop) // 2
    offs = [(0, 0), (0, nw - crop), (nh - crop, 0), (nh - crop, nw - crop),
            (cc_t, cc_l)]
    crops = [arr[t:t + crop, l:l + crop] for t, l in offs]
    crops += [c[:, ::-1] for c in crops]  # same set as torchvision TenCrop
    return np.stack(crops)


def normalize_torch(u8):
    x = torch.tensor(u8.astype(np.float32)) / 255.0
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    return (x.permute(0, 3, 1, 2) - mean) / std


def haversine_km(lat1, lng1, lat2, lng2):
    r = 6371.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lng2) - np.radians(lng1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(np.clip(a, 0, 1)))


def torch_side_tables(sd, image_dir, meta, hierarchy, partitionings,
                      stages=STAGES, files=None, return_margin=False):
    """The reference eval: ten-crop -> softmax-prob mean -> per-head argmax
    + f* -> GCD threshold accuracies. Returns {p_key: {thr: frac}}.

    With return_margin=True, also returns the minimum relative
    decisiveness margin over all (image, head/hierarchy) argmaxes:
    (top1 - top2) / top1 of the folded scores. Near-zero margins mean
    the fp32-XLA vs torch argmax can legitimately flip — callers should
    assert a floor before demanding exact table equality."""
    names = [p.name for p in partitionings] + ["hierarchy"]
    hits = {k: np.zeros(len(THRESHOLDS)) for k in names}
    total = 0
    min_margin = np.inf

    def margin_of(score):
        top2 = np.sort(score[np.isfinite(score)])[-2:]
        if top2[-1] <= 0:
            return 0.0
        return float((top2[1] - top2[0]) / top2[1])
    maps = [np.asarray(m) for m in hierarchy.maps]
    valid = np.asarray(hierarchy.valid)
    if files is None:
        files = sorted(os.listdir(image_dir))
    gt = {str(r.IMG_ID): (r.LAT, r.LON) for r in meta.itertuples()}
    for fname in files:
        crops = pil_tencrop(os.path.join(image_dir, fname))
        with torch.no_grad():
            logits = torch_forward(sd, normalize_torch(crops),
                                   stages=stages)
        probs = [torch.softmax(lg, dim=-1).numpy().mean(0) for lg in logits]
        glat, glng = gt[fname]
        total += 1
        # per-partitioning argmax
        for p, pr in zip(partitionings, probs):
            c = int(pr.argmax())
            min_margin = min(min_margin, margin_of(pr))
            d = haversine_km(p.lat[c], p.lng[c], glat, glng)
            hits[p.name] += np.asarray(THRESHOLDS) >= d
        # f*: product of ancestor probs over fine cells
        score = np.ones_like(probs[-1])
        for pr, m in zip(probs, maps):
            score = score * pr[m]
        score = np.where(valid, score, -np.inf)
        c = int(score.argmax())
        min_margin = min(min_margin, margin_of(score))
        fine = partitionings[-1]
        d = haversine_km(fine.lat[c], fine.lng[c], glat, glng)
        hits["hierarchy"] += np.asarray(THRESHOLDS) >= d
    tables = {
        k: {t: float(h) / total for t, h in zip(THRESHOLDS, v)}
        for k, v in hits.items()
    }
    if return_margin:
        return tables, min_margin
    return tables


# ---------------------------------------------------------------------------
# the rehearsal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def world(tmp_path_factory, geo_parts):
    root = tmp_path_factory.mktemp("rehearsal")
    cell_files = []
    for p in geo_parts:
        path = str(root / f"cells_{p.name}.csv")
        p.to_csv(path)
        cell_files.append(path)

    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(42)
    rows = []
    sizes = [(300, 256), (256, 340), (280, 280), (320, 264),
             (256, 256), (272, 304), (258, 310), (330, 258)]
    for i in range(N_EVAL):
        w, h = sizes[i % len(sizes)]
        # distinct dominant color + noise per image so an untrained-ish
        # net still produces varied predictions across images
        base = np.zeros((h, w, 3), np.float32)
        base[..., i % 3] = 80 + 20 * i
        base[..., (i + 1) % 3] = 255 - 25 * i
        arr = np.clip(
            base + rng.normal(0, 40, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=90)
        rows.append((name, float(rng.uniform(47.6, 49.4)),
                     float(rng.uniform(1.6, 3.4))))
    import pandas as pd

    meta = pd.DataFrame(rows, columns=["IMG_ID", "LAT", "LON"])
    meta_path = str(root / "meta.csv")
    meta.to_csv(meta_path, index=False)
    return root, cell_files, str(img_dir), meta_path, meta


def _train_and_import(world, geo_parts, targets, tag):
    root, cell_files, img_dir, meta_path, meta = world
    n_classes = [len(p) for p in geo_parts]
    seed = 42 + len(tag)  # deterministic per variant, order-independent
    sd = make_torch_params(n_classes, rng=np.random.default_rng(seed))
    train_torch(sd, n_classes, targets,
                steps=14 if targets else 5,
                batch=6 if targets else 4,
                rng=np.random.default_rng(seed + 1000))
    ckpt_path = str(root / f"epoch=004-val_loss=1.0{tag}.ckpt")
    with torch.no_grad():
        torch.save(
            {"state_dict": {f"model.{k}": v.detach() for k, v in sd.items()},
             "hyper_parameters": {"arch": ARCH}},
            ckpt_path,
        )
    out_dir = str(root / f"imported{tag}")
    imp.main([
        "--torch_ckpt", ckpt_path,
        "--cell_files", *cell_files,
        "--output", out_dir,
        "--arch", ARCH,
    ])
    return sd, out_dir


@pytest.fixture(scope="module")
def imported(world, geo_parts):
    """Noise-trained torch ckpt -> import CLI (exact-parity test)."""
    return _train_and_import(world, geo_parts, None, "")


@pytest.fixture(scope="module")
def imported_decisive(world, geo_parts):
    """Color-structure-trained ckpt (decisive eval logits, int8 leg)."""
    return _train_and_import(world, geo_parts, color_targets(geo_parts),
                             "_dec")


def test_full_cli_table_matches_torch_stack(world, geo_parts, imported):
    root, cell_files, img_dir, meta_path, meta = world
    sd, out_dir = imported

    # 3. our full CLI path (host-exact TTA, reference fold, fp32)
    from classification.test import main as test_main

    all_results = test_main([
        "--checkpoint", out_dir,
        "--image_dirs", img_dir,
        "--meta_files", meta_path,
        "--cpu", "--precision", "32", "--crops", "10",
        "--exact_tta", "--tta_fold", "prob_mean",
        "--batch_size", str(N_EVAL),
    ])
    ours = all_results[os.path.basename(img_dir)]

    # 4. independent torch-side eval
    from geoestimation_tpu.geo import Hierarchy

    hierarchy = Hierarchy.build(geo_parts)
    theirs = torch_side_tables(sd, img_dir, meta, hierarchy, geo_parts)

    # 5. tables must agree exactly (same hit counts per threshold)
    assert "_n_images_without_meta" not in ours
    for p_key, expect in theirs.items():
        got = ours[p_key]
        got = {float(k): v for k, v in got.items()}
        for thr in THRESHOLDS:
            assert got[thr] == expect[thr], (
                f"{p_key}@{thr}km: ours={got[thr]} torch={expect[thr]}"
            )
    # non-degenerate evidence: the table must contain both a hit and a
    # miss somewhere, so the everything-broken (all-zero) and trivially
    # -saturated cases can't pass vacuously
    vals = [theirs[k][t] for k in theirs for t in THRESHOLDS]
    assert any(v > 0.0 for v in vals), theirs
    assert any(v < 1.0 for v in vals), theirs


def test_int8_tables_track_fp32_on_imported_checkpoint(world, geo_parts,
                                                       imported_decisive):
    """The int8 serving precision on an IMPORTED reference-style
    checkpoint: `classification.test --precision 8` must produce the
    same accuracy table as fp32 up to at most one flipped image per
    cell (PTQ argmax flips happen only near ties; the demo-world
    checkpoint measured zero). Single-crop keeps the XLA:CPU int8 conv
    runtime sane."""
    root, cell_files, img_dir, meta_path, meta = world
    sd, out_dir = imported_decisive
    from classification.test import main as test_main

    common = [
        "--checkpoint", out_dir,
        "--image_dirs", img_dir,
        "--meta_files", meta_path,
        "--cpu", "--crops", "1",
        "--batch_size", str(N_EVAL),
    ]
    fp32 = test_main(common + ["--precision", "32"])
    int8 = test_main(common + ["--precision", "8"])
    name = os.path.basename(img_dir)
    tol = 1.0 / N_EVAL + 1e-9
    for p_key, expect in fp32[name].items():
        if p_key.startswith("_"):
            continue
        got = int8[name][p_key]
        for thr in expect:
            assert abs(got[thr] - expect[thr]) <= tol, (
                f"{p_key}@{thr}km: int8={got[thr]} fp32={expect[thr]}"
            )

# ---------------------------------------------------------------------------
# flagship-scale rehearsal (round-3, VERDICT weak #6)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_cli_table_matches_torch_stack_resnet50(world, geo_parts):
    """The SAME import -> `classification.test` table-parity proof at the
    FLAGSHIP layout: resnet50 stages (3,4,6,3), full ten-crop host-exact
    TTA, prob-mean fold. A 4-image eval subset keeps single-core CPU
    time sane; table equality is still exact per threshold cell."""
    root, cell_files, img_dir, meta_path, meta = world
    stages = (3, 4, 6, 3)
    n_classes = [len(p) for p in geo_parts]
    sd = make_torch_params(n_classes, stages=stages,
                           rng=np.random.default_rng(7))
    # color-target training (see color_targets): decisive,
    # geographically-sensible logits so the tables contain hits AND
    # misses (a noise-trained rn50 predicts one far cell everywhere,
    # which would trip the non-degeneracy guard below)
    train_torch(sd, n_classes, targets=color_targets(geo_parts),
                steps=6, batch=4, size=96, stages=stages,
                rng=np.random.default_rng(1007))
    ckpt_path = str(root / "epoch=004-val_loss=1.0_rn50.ckpt")
    with torch.no_grad():
        torch.save(
            {"state_dict": {f"model.{k}": v.detach()
                            for k, v in sd.items()},
             "hyper_parameters": {"arch": "resnet50"}},
            ckpt_path,
        )
    out_dir = str(root / "imported_rn50")
    imp.main([
        "--torch_ckpt", ckpt_path,
        "--cell_files", *cell_files,
        "--output", out_dir,
        "--arch", "resnet50",
    ])

    # 4-image subset (same meta: extra rows are simply unused)
    import shutil

    sub = str(root / "images_rn50")
    os.makedirs(sub, exist_ok=True)
    files = sorted(os.listdir(img_dir))[:4]
    for f in files:
        shutil.copy(os.path.join(img_dir, f), os.path.join(sub, f))

    from classification.test import main as test_main

    all_results = test_main([
        "--checkpoint", out_dir,
        "--image_dirs", sub,
        "--meta_files", meta_path,
        "--cpu", "--precision", "32", "--crops", "10",
        "--exact_tta", "--tta_fold", "prob_mean",
        "--batch_size", "4",
    ])
    ours = all_results[os.path.basename(sub)]

    from geoestimation_tpu.geo import Hierarchy

    hierarchy = Hierarchy.build(geo_parts)
    theirs, margin = torch_side_tables(sd, sub, meta, hierarchy, geo_parts,
                                       stages=stages, files=files,
                                       return_margin=True)
    # Decisiveness guard: exact table equality across two fp32 stacks
    # (XLA vs torch) is only a meaningful assertion when every argmax
    # has daylight under it — near-tie scores flip legitimately under
    # operation-reordering-level numeric differences. With the fixed
    # per-test seeds above this margin is deterministic; if a future
    # seed/layout change lands on a near-tie, fail HERE with a clear
    # message instead of producing a spurious parity mismatch.
    assert margin > 0.02, (
        f"checkpoint produced near-tie logits (min relative margin "
        f"{margin:.4f}); retune seeds/steps rather than comparing tables"
    )
    assert "_n_images_without_meta" not in ours
    for p_key, expect in theirs.items():
        got = {float(k): v for k, v in ours[p_key].items()}
        for thr in THRESHOLDS:
            assert got[thr] == expect[thr], (
                f"{p_key}@{thr}km: ours={got[thr]} torch={expect[thr]}"
            )
    vals = [theirs[k][t] for k in theirs for t in THRESHOLDS]
    assert any(v > 0.0 for v in vals), theirs
    assert any(v < 1.0 for v in vals), theirs
