"""COCO/DensePose-shaped synthetic world for the full-scale pipeline
drill.

No MSCOCO-DensePose exists in this image (zero egress), so this builds
a dataset with the DensePose task's SHAPE — the 15-part label space,
COCO-like image sizes (max side 640, the reference's inference size:
bashscripts/densepose/train_spml_point.sh:50-53), POINT supervision in
the reference's segcls/densepose_points/gray layout, dense GT in
segcls/densepose/gray, instance maps in seginst — laid out exactly as
the reference pipeline's sed/flag surface expects
(twke18/SPML bashscripts/densepose/train_spml_point.sh:63-66,117-126),
so the ACTUAL bash pipeline runs on it at flagship crop 512 / dim 32 /
24x24 inference k-means.

World model (scaled up from pyscripts/misc/synthetic_densepose_e2e.py):
1-2 humanoid figures per image — torso ellipse, head OFFSET toward the
figure's anatomical right (the laterality cue), left/right hand and
left/right foot pairs where each pair shares ONE color, so laterality
is only inferable from pose context and random mirroring must remap
2<->3 / 4<->5 (DENSEPOSE_FLIP_REMAP) to keep labels consistent.

Usage: python pyscripts/misc/make_densepose_drill_world.py \
           --root /tmp/drill_dp/densepose_world [--n_train 120] [--n_val 30]
"""

import argparse
import os

import numpy as np
import PIL.Image

N_CLASSES = 15
# class ids: 1 torso, 2 right hand, 3 left hand, 4 left foot,
# 5 right foot, 14 head. Hand pair and foot pair each share a color.
PART_COLORS = {1: [200, 60, 60], 2: [60, 80, 200], 3: [60, 80, 200],
               4: [220, 180, 60], 5: [220, 180, 60], 14: [150, 70, 180]}

# COCO-like (w, h) spread, max side 640
COCO_SHAPES = [(640, 480), (480, 640), (640, 427), (500, 375),
               (640, 640), (427, 640), (640, 426), (612, 612),
               (640, 360), (375, 500)]

BG_PALETTES = np.asarray(
    [[60, 95, 65], [95, 95, 115], [125, 105, 75], [55, 75, 95]],
    np.float32)


def _draw_figure(rng, sem, inst, inst_id, yy, xx, cy, cx, s):
    """One humanoid at center (cy, cx), scale s (s=1 -> the 160-px
    e2e figure geometry)."""
    torso = (((yy - cy) / (28.0 * s)) ** 2
             + ((xx - cx) / (16.0 * s)) ** 2) < 1
    head = ((yy - (cy - 38 * s)) ** 2
            + (xx - (cx - 14 * s)) ** 2) < (13 * s) ** 2
    rhand = ((yy - (cy - 8 * s)) ** 2
             + (xx - (cx - 28 * s)) ** 2) < (11 * s) ** 2
    lhand = ((yy - (cy - 8 * s)) ** 2
             + (xx - (cx + 28 * s)) ** 2) < (11 * s) ** 2
    rfoot = ((yy - (cy + 34 * s)) ** 2
             + (xx - (cx - 12 * s)) ** 2) < (9 * s) ** 2
    lfoot = ((yy - (cy + 34 * s)) ** 2
             + (xx - (cx + 12 * s)) ** 2) < (9 * s) ** 2
    for cls, m in ((1, torso), (14, head), (2, rhand), (3, lhand),
                   (5, rfoot), (4, lfoot)):
        sem[m] = cls
        inst[m] = inst_id


def _points(rng, sem, per_class=12, block=4):
    """Sparse point annotation: 255 everywhere except small blocks at
    sampled in-class locations (DensePose point supervision)."""
    out = np.full_like(sem, 255)
    for cls in np.unique(sem):
        ys, xs = np.nonzero(sem == cls)
        if len(ys) == 0:
            continue
        take = rng.choice(len(ys), min(per_class, len(ys)),
                          replace=False)
        for t in take:
            y, x = ys[t], xs[t]
            sl = (slice(max(0, y - block), y + block + 1),
                  slice(max(0, x - block), x + block + 1))
            out[sl] = np.where(sem[sl] == cls, cls, out[sl])
    return out


def make_world(root, n_train=120, n_val=30, seed=11):
    rng = np.random.RandomState(seed)
    sub = {
        "img": os.path.join(root, "images"),
        "gt": os.path.join(root, "segcls", "densepose", "gray"),
        "pts": os.path.join(root, "segcls", "densepose_points", "gray"),
        "inst": os.path.join(root, "seginst"),
    }
    for d in sub.values():
        os.makedirs(d, exist_ok=True)

    names = ([f"train2014_{i:06d}" for i in range(n_train)]
             + [f"minival2014_{i:06d}" for i in range(n_val)])
    for i, name in enumerate(names):
        w, h = COCO_SHAPES[rng.randint(len(COCO_SHAPES))]
        sem = np.zeros((h, w), np.uint8)
        inst = np.zeros((h, w), np.uint8)
        yy, xx = np.mgrid[:h, :w]
        for fid in range(rng.randint(1, 3)):
            s = rng.uniform(1.6, min(h, w) / 180.0)
            margin_y, margin_x = int(55 * s), int(60 * s)
            cy = rng.randint(margin_y, max(margin_y + 1, h - margin_y))
            cx = rng.randint(margin_x, max(margin_x + 1, w - margin_x))
            _draw_figure(rng, sem, inst, fid + 1, yy, xx, cy, cx, s)

        bg = BG_PALETTES[rng.randint(len(BG_PALETTES))]
        img = np.tile(bg, (h, w, 1))
        img += ((yy / h - 0.5) * rng.uniform(-40, 40)
                + (xx / w - 0.5) * rng.uniform(-40, 40))[..., None]
        img += (np.sin(yy / 9.0) * 5 + np.cos(xx / 11.0) * 5)[..., None]
        for cls, col in PART_COLORS.items():
            m = sem == cls
            img[m] = np.asarray(col, np.float32) + rng.uniform(-15, 15, 3)
        img += rng.randn(h, w, 3) * 14
        img = np.clip(img, 0, 255).astype(np.uint8)

        pts = _points(rng, sem)

        PIL.Image.fromarray(img).save(
            os.path.join(sub["img"], name + ".jpg"), quality=95)
        PIL.Image.fromarray(sem).save(os.path.join(sub["gt"],
                                                   name + ".png"))
        PIL.Image.fromarray(inst).save(os.path.join(sub["inst"],
                                                    name + ".png"))
        PIL.Image.fromarray(pts).save(os.path.join(sub["pts"],
                                                   name + ".png"))

    lists = os.path.join(root, "lists")
    os.makedirs(lists, exist_ok=True)
    train_ids, val_ids = names[:n_train], names[n_train:]

    def _write(fn, lines):
        with open(os.path.join(lists, fn), "w") as f:
            f.write("\n".join(lines) + "\n")

    # line layouts the pipeline's seds rewrite
    # (train_spml_point.sh:117-121): images/... ,
    # segcls/densepose_points/gray/... , seginst/...
    _write("train_points.txt", [
        f"images/{n}.jpg segcls/densepose_points/gray/{n}.png "
        f"seginst/{n}.png" for n in train_ids])
    _write("memory.txt", [
        f"images/{n}.jpg segcls/densepose/gray/{n}.png "
        f"seginst/{n}.png" for n in train_ids])
    _write("val.txt", [
        f"images/{n}.jpg segcls/densepose/gray/{n}.png "
        f"seginst/{n}.png" for n in val_ids])
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=120)
    ap.add_argument("--n_val", type=int, default=30)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    make_world(args.root, args.n_train, args.n_val, args.seed)
    print(f"densepose drill world at {args.root}: {args.n_train} train "
          f"+ {args.n_val} val, 15-part label space, max side 640")


if __name__ == "__main__":
    main()
