"""VOC-shaped synthetic world for the full-scale pipeline drill.

No VOC/COCO exists in this image (zero egress), so this builds a
dataset with VOC's SHAPE — 21 classes, the real aspect-ratio spread
(max side 500), scribble annotations in the reference's
scribble_annotation/VOC2012/dilate_3/segcls layout, HED-style
oversegmentation instance maps, instance GT (seginst), SEAM-style CAM
.npy dicts + thresholded seed PNGs — laid out exactly as the reference
pipelines expect (twke18/SPML bashscripts/voc12/train_spml_scribble.sh:
69-73,105-151 and train_spml_tag.sh:56,94-104), so the ACTUAL bash
pipelines run on it at flagship crop 512.

World model per image: textured background + 2-4 colored objects
(ellipses / rectangles / 2-3-circle blobs) from 20 foreground classes,
per-image illumination gradient, pixel noise. CAMs are blurred object
indicators with spill — imperfect on purpose, like real SEAM CAMs.

Usage: python pyscripts/misc/make_drill_world.py --root /tmp/drill \
           [--n_train 200] [--n_val 40] [--seed 11]
"""

import argparse
import os

import numpy as np
import PIL.Image
import PIL.ImageFilter

# real VOC12 aspect-ratio spread (w, h)
VOC_SHAPES = [(500, 375), (375, 500), (500, 333), (333, 500),
              (500, 366), (480, 360), (500, 281), (406, 500),
              (500, 500), (500, 375), (375, 500), (500, 334)]

N_CLASSES = 21  # background + 20

# distinctive class colors (bg handled separately), mildly saturated
_rng_col = np.random.RandomState(123)
CLASS_COLORS = np.clip(
    _rng_col.randint(30, 226, (N_CLASSES, 3)).astype(np.float32),
    0, 255)

BG_PALETTES = np.asarray(
    [[70, 110, 70], [100, 100, 120], [130, 110, 80], [60, 80, 100]],
    np.float32)


def _scribble(rng, mask, n_strokes=2, width=3):
    """Thin random strokes inside `mask` (dilate_3-style scribbles)."""
    out = np.zeros_like(mask)
    ys, xs = np.nonzero(mask)
    if len(ys) < 30:
        return out
    h, w = mask.shape
    for _ in range(n_strokes):
        i = rng.randint(len(ys))
        y, x = float(ys[i]), float(xs[i])
        ang = rng.rand() * 2 * np.pi
        for _ in range(120):
            yi, xi = int(round(y)), int(round(x))
            if not (0 <= yi < h and 0 <= xi < w) or not mask[yi, xi]:
                break
            out[max(0, yi - width // 2):yi + width // 2 + 1,
                max(0, xi - width // 2):xi + width // 2 + 1] |= \
                mask[max(0, yi - width // 2):yi + width // 2 + 1,
                     max(0, xi - width // 2):xi + width // 2 + 1]
            ang += (rng.rand() - 0.5) * 0.5
            y += np.sin(ang)
            x += np.cos(ang)
    return out


def _object_mask(rng, h, w):
    yy, xx = np.mgrid[:h, :w]
    cy = rng.randint(h // 5, 4 * h // 5)
    cx = rng.randint(w // 5, 4 * w // 5)
    kind = rng.randint(3)
    if kind == 0:  # ellipse
        ry = rng.randint(h // 10, h // 3)
        rx = rng.randint(w // 10, w // 3)
        ang = rng.rand() * np.pi
        ys, xs = yy - cy, xx - cx
        yr = ys * np.cos(ang) + xs * np.sin(ang)
        xr = -ys * np.sin(ang) + xs * np.cos(ang)
        return (yr / ry) ** 2 + (xr / rx) ** 2 < 1.0
    if kind == 1:  # rectangle
        ry = rng.randint(h // 10, h // 4)
        rx = rng.randint(w // 10, w // 4)
        return (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
    # blob: union of 2-3 circles
    m = np.zeros((h, w), bool)
    r0 = rng.randint(min(h, w) // 10, min(h, w) // 4)
    for _ in range(rng.randint(2, 4)):
        dy, dx = rng.randint(-r0, r0 + 1, 2)
        r = rng.randint(r0 // 2, r0 + 1)
        m |= (yy - cy - dy) ** 2 + (xx - cx - dx) ** 2 < r * r
    return m


def _voronoi_oversegments(rng, sem, n_seeds=48):
    """HED-style oversegmentation: Voronoi regions intersected with the
    semantic regions (oversegments respect object boundaries), relabeled
    consecutively into uint8."""
    h, w = sem.shape
    sy = rng.randint(0, h, n_seeds)
    sx = rng.randint(0, w, n_seeds)
    yy, xx = np.mgrid[:h, :w]
    d = ((yy[None] - sy[:, None, None]) ** 2
         + (xx[None] - sx[:, None, None]) ** 2)
    vor = np.argmin(d, axis=0).astype(np.int32)
    combined = vor * (N_CLASSES + 4) + sem.astype(np.int32)
    _, inv = np.unique(combined, return_inverse=True)
    return np.minimum(inv.reshape(h, w), 254).astype(np.uint8)


def _blur(arr, radius):
    im = PIL.Image.fromarray(np.clip(arr * 255, 0, 255).astype(np.uint8))
    im = im.filter(PIL.ImageFilter.GaussianBlur(radius))
    return np.asarray(im, np.float32) / 255.0


def make_world(root, n_train=200, n_val=40, seed=11):
    rng = np.random.RandomState(seed)
    sub = {
        "jpg": os.path.join(root, "VOC2012", "JPEGImages"),
        "gt": os.path.join(root, "VOC2012", "segcls"),
        "inst": os.path.join(root, "VOC2012", "seginst"),
        "hed": os.path.join(root, "VOC2012", "hed"),
        "scr": os.path.join(root, "scribble_annotation", "VOC2012",
                            "dilate_3", "segcls"),
        "cam": os.path.join(root, "VOC2012", "cam", "seam"),
        "seam": os.path.join(root, "VOC2012", "cam", "seam_a6_th0.2"),
    }
    for d in sub.values():
        os.makedirs(d, exist_ok=True)

    names = ([f"2007_{i:06d}" for i in range(n_train)]
             + [f"2008_{i:06d}" for i in range(n_val)])
    for i, name in enumerate(names):
        w, h = VOC_SHAPES[rng.randint(len(VOC_SHAPES))]
        sem = np.zeros((h, w), np.uint8)
        inst = np.zeros((h, w), np.uint8)
        # every class appears in both splits: first object's class cycles
        first_cls = 1 + i % (N_CLASSES - 1)
        n_obj = rng.randint(2, 5)
        obj_masks = []
        for k in range(n_obj):
            cls = first_cls if k == 0 else rng.randint(1, N_CLASSES)
            m = _object_mask(rng, h, w)
            sem[m] = cls
            inst[m] = k + 1
            obj_masks.append((cls, m))

        bg = BG_PALETTES[rng.randint(len(BG_PALETTES))]
        img = np.tile(bg, (h, w, 1))
        yy, xx = np.mgrid[:h, :w]
        img += ((yy / h - 0.5) * rng.uniform(-40, 40)
                + (xx / w - 0.5) * rng.uniform(-40, 40))[..., None]
        img += (np.sin(yy / 9.0) * 5 + np.cos(xx / 11.0) * 5)[..., None]
        for cls, m in obj_masks:
            img[m] = CLASS_COLORS[cls] + rng.uniform(-20, 20, 3)
        img += rng.randn(h, w, 3) * 14
        img = np.clip(img, 0, 255).astype(np.uint8)

        scr = np.full((h, w), 255, np.uint8)
        for cls in np.unique(sem):
            m = _scribble(rng, sem == cls,
                          n_strokes=3 if cls == 0 else 2)
            scr[m.astype(bool)] = cls

        hed = _voronoi_oversegments(rng, sem)

        # SEAM-style CAMs: blurred object indicators with spill + noise;
        # dict {fg_class-1: [h, w] float} like the reference's npys
        # (pseudo_camrw_crf.py:103-112 reads .item() then k+1 mapping)
        cam = {}
        present = sorted({cls for cls, _ in obj_masks})
        for cls in present:
            m = np.zeros((h, w), np.float32)
            for c2, mm in obj_masks:
                if c2 == cls:
                    m[mm] = 1.0
            blurred = _blur(m, radius=max(6, min(h, w) // 24))
            blurred *= rng.uniform(0.75, 1.0)
            blurred += rng.rand(h, w).astype(np.float32) * 0.06
            cam[cls - 1] = np.clip(blurred, 0, 1).astype(np.float32)
        np.save(os.path.join(sub["cam"], name + ".npy"),
                np.asarray(cam, dtype=object))

        # thresholded SEAM seed labels (a6_th0.2): bg power prior,
        # argmax, low-confidence pixels -> 255
        full = np.zeros((N_CLASSES, h, w), np.float32)
        for k, v in cam.items():
            full[k + 1] = v
        full[0] = np.power(1.0 - np.max(full[1:], axis=0), 6.0)
        seed_lab = np.argmax(full, axis=0).astype(np.uint8)
        conf = np.max(full, axis=0)
        seed_lab[conf < 0.2] = 255
        PIL.Image.fromarray(seed_lab).save(
            os.path.join(sub["seam"], name + ".png"))

        PIL.Image.fromarray(img).save(
            os.path.join(sub["jpg"], name + ".jpg"), quality=95)
        PIL.Image.fromarray(sem).save(os.path.join(sub["gt"],
                                                   name + ".png"))
        PIL.Image.fromarray(inst).save(os.path.join(sub["inst"],
                                                    name + ".png"))
        PIL.Image.fromarray(hed).save(os.path.join(sub["hed"],
                                                   name + ".png"))
        PIL.Image.fromarray(scr).save(os.path.join(sub["scr"],
                                                   name + ".png"))

    # lists in the reference's exact layouts (make_voc12_lists.py)
    lists = os.path.join(root, "lists")
    os.makedirs(lists, exist_ok=True)
    train_ids = names[:n_train]
    val_ids = names[n_train:]

    def _write(fn, lines):
        with open(os.path.join(lists, fn), "w") as f:
            f.write("\n".join(lines) + "\n")

    _write("scribble.txt", [
        f"VOC2012/JPEGImages/{n}.jpg "
        f"scribble_annotation/VOC2012/dilate_3/segcls/{n}.png "
        f"VOC2012/hed/{n}.png" for n in train_ids])
    _write("seam.txt", [
        f"VOC2012/JPEGImages/{n}.jpg "
        f"VOC2012/cam/seam_a6_th0.2/{n}.png "
        f"VOC2012/hed/{n}.png" for n in train_ids])
    _write("memory.txt", [
        f"VOC2012/JPEGImages/{n}.jpg VOC2012/segcls/{n}.png "
        f"VOC2012/hed/{n}.png" for n in train_ids])
    _write("val.txt", [
        f"VOC2012/JPEGImages/{n}.jpg VOC2012/segcls/{n}.png "
        f"VOC2012/segcls/{n}.png" for n in val_ids])
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=200)
    ap.add_argument("--n_val", type=int, default=40)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    make_world(args.root, args.n_train, args.n_val, args.seed)
    print(f"drill world at {args.root}: {args.n_train} train "
          f"+ {args.n_val} val, 21 classes, VOC aspect spread")


if __name__ == "__main__":
    main()
