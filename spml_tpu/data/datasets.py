"""Datasets + a threaded host-side loader feeding the TPU.

Behavioral reference in twke18/SPML:
* spml/data/datasets/base_dataset.py:15-223 (ListDataset: 'img sem inst'
  list lines, RGB/255 floats, mirror->scale(.5-1.5)->crop-pad train
  pipeline, mean/std normalize);
* spml/data/datasets/list_tag_dataset.py:11-219 (ListTagDataset: 256-wide
  multi-hot tag from the ORIGINAL label map; classifier variant with
  scale .5-2.0, grayscale p=.3, blur p=.5);
* spml/data/datasets/densepose_dataset.py:11-199 (15 body parts,
  left/right label swap on horizontal flip).

TPU re-design: emits NHWC numpy batches of the GLOBAL batch
(batch = per-chip batch x num chips, matching the reference's
one-loader-batch-per-GPU feed, others.py:50-73); a background thread
pool prefetches so host preprocessing overlaps device compute.
"""

from __future__ import annotations

import concurrent.futures
import os
import threading
from typing import Iterator

import numpy as np
import PIL.Image

from spml_tpu.data import transforms

TAG_WIDTH = 256

DENSEPOSE_PART_LABELS = {
    0: "background", 1: "torso", 2: "right hand", 3: "left hand",
    4: "left foot", 5: "right foot", 6: "right thigh", 7: "left thigh",
    8: "right leg", 9: "left leg", 10: "left arm", 11: "right arm",
    12: "left forearm", 13: "right forearm", 14: "head",
}
# left/right swaps under horizontal flip (densepose_dataset.py:74-76)
DENSEPOSE_FLIP_REMAP = np.arange(256, dtype=np.uint8)
DENSEPOSE_FLIP_REMAP[:15] = [0, 1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10,
                             13, 12, 14]


def read_list(data_dir: str, data_list: str):
    images, sems, insts = [], [], []
    with open(data_list) as f:
        for line in f:
            line = line.strip("\n")
            if not line:
                continue
            parts = line.split(" ")
            images.append(os.path.join(data_dir, parts[0]))
            if len(parts) >= 3:
                sems.append(os.path.join(data_dir, parts[1]))
                insts.append(os.path.join(data_dir, parts[2]))
    return images, sems, insts


def read_image(path: str) -> np.ndarray:
    img = np.array(PIL.Image.open(path).convert(mode="RGB"))
    return img.astype(np.float32) / 255.0


def read_label(path: str) -> np.ndarray:
    return np.array(PIL.Image.open(path).convert(mode="L"))


class ListDataset:
    """Plain dataset: returns dicts of numpy arrays per index."""

    flip_label_remap: np.ndarray | None = None
    with_tags = False
    scale_range = (0.5, 1.5)
    color_aug = False
    # instance/test override: False forces the Python/PIL path even
    # where the fused C++ item (native/dataio) is eligible
    use_native = True

    def __init__(self, data_dir, data_list, img_mean=(0, 0, 0),
                 img_std=(1, 1, 1), size=None, random_crop=False,
                 random_scale=False, random_mirror=False, training=False,
                 seed=0):
        (self.image_paths, self.semantic_label_paths,
         self.instance_label_paths) = read_list(data_dir, data_list)
        self.training = training
        self.img_mean = np.asarray(img_mean, np.float32)
        self.img_std = np.asarray(img_std, np.float32)
        self.size = tuple(size) if size is not None else None
        self.random_crop = random_crop
        self.random_scale = random_scale
        self.random_mirror = random_mirror
        self.seed = seed

    def __len__(self):
        return len(self.image_paths)

    def _load(self, idx):
        image = read_image(self.image_paths[idx])
        sem = (read_label(self.semantic_label_paths[idx])
               if self.semantic_label_paths else None)
        inst = (read_label(self.instance_label_paths[idx])
                if self.instance_label_paths else None)
        return image, sem, inst

    def _native_item(self, idx, rng):
        """Fused C++ item (native_io) for the standard training path.
        Draws the SAME rng stream as the Python path below, so outputs
        match per (seed, idx) — decode/mirror/crop/normalize bitwise,
        bilinear resize within float tolerance (tests/test_native_io).
        Returns None (without having consumed draws irrecoverably —
        the caller rebuilds rng) when the item can't go native."""
        from spml_tpu.data import native_io
        if (not self.use_native or not self.training or self.color_aug
                or self.size is None or not self.random_crop
                or not self.semantic_label_paths):
            return None
        img_path = self.image_paths[idx]
        sem_path = self.semantic_label_paths[idx]
        inst_path = (self.instance_label_paths[idx]
                     if self.instance_label_paths else None)
        if not sem_path.lower().endswith(".png") or (
                inst_path and not inst_path.lower().endswith(".png")):
            return None
        dims = native_io.image_size(img_path)
        if dims is None:
            return None
        h, w = dims
        mirror = bool(self.random_mirror
                      and rng.uniform(0, 1.0) >= 0.5)
        ratio = (float(rng.uniform(*self.scale_range))
                 if self.random_scale else 1.0)
        new_h = int(ratio * h) if self.random_scale else h
        new_w = int(ratio * w) if self.random_scale else w
        pad_h = max(new_h, self.size[0])
        pad_w = max(new_w, self.size[1])
        start_h = int(np.floor(rng.uniform(0, pad_h - self.size[0])))
        start_w = int(np.floor(rng.uniform(0, pad_w - self.size[1])))
        res = native_io.train_item(
            img_path, sem_path, inst_path, mirror,
            ratio if self.random_scale else 1.0, self.size,
            (start_h, start_w), self.img_mean, self.img_std,
            want_tags=self.with_tags)
        if res is None:
            return None
        image, sem, inst, tag_hist = res
        if mirror and self.flip_label_remap is not None:
            # remap commutes with nearest-resize/crop; pad 255 is a
            # fixed point of the remap table
            sem = self.flip_label_remap[sem].astype(np.int32)
        out = {"image": image, "semantic_label": sem}
        if inst is not None:
            out["instance_label"] = inst
        if self.with_tags:
            tags = np.zeros((TAG_WIDTH,), np.uint8)
            tags[np.nonzero(tag_hist[:TAG_WIDTH])[0]] = 1
            out["semantic_tag"] = tags.astype(np.int32)
        return out

    def __getitem__(self, idx):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, idx, int(self.training)]))
        native = self._native_item(idx, rng)
        if native is not None:
            return native
        # decode failure mid-native leaves rng partially consumed;
        # rebuild so the Python path draws the full stream itself
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, idx, int(self.training)]))
        image, sem, inst = self._load(idx)
        tags = None
        if self.with_tags and sem is not None:
            tags = np.zeros((TAG_WIDTH,), np.uint8)
            tags[np.unique(sem)] = 1

        if self.training:
            label = np.stack([sem, inst], axis=2)
            if self.random_mirror and rng.uniform(0, 1.0) >= 0.5:
                image, label = transforms.mirror(image, label)
                if self.flip_label_remap is not None:
                    label[..., 0] = self.flip_label_remap[label[..., 0]]
            if self.random_scale:
                image, label = transforms.random_resize(
                    rng, image, label, *self.scale_range)
            if self.random_crop:
                image, label = transforms.random_crop_with_pad(
                    rng, image, label, self.size, self.img_mean, 255)
            if self.color_aug:
                image = transforms.random_grayscale(rng, image)
                image = transforms.random_gaussian_blur(rng, image)
            sem, inst = label[..., 0], label[..., 1]
        elif self.size is not None:
            image = transforms.resize_with_pad(image, self.size,
                                               self.img_mean)
            image = image[:self.size[0], :self.size[1], ...]

        image = (image - self.img_mean) / self.img_std
        out = {"image": image.astype(np.float32)}
        if sem is not None:
            out["semantic_label"] = sem.astype(np.int32)
        if inst is not None:
            out["instance_label"] = inst.astype(np.int32)
        if tags is not None:
            out["semantic_tag"] = tags.astype(np.int32)
        return out


class ListTagDataset(ListDataset):
    """Adds the 256-wide dataset-level tag vector
    (list_tag_dataset.py:75-82)."""
    with_tags = True


class ListTagClassifierDataset(ListTagDataset):
    """Stage-2 classifier training: stronger augmentation
    (list_tag_dataset.py:193-214)."""
    scale_range = (0.5, 2.0)
    color_aug = True


class DenseposeDataset(ListDataset):
    flip_label_remap = DENSEPOSE_FLIP_REMAP


class DenseposeTagDataset(DenseposeDataset):
    with_tags = True


class DenseposeClassifierDataset(DenseposeDataset):
    scale_range = (0.5, 2.0)
    color_aug = True
    with_tags = True


class Loader:
    """Shuffling, prefetching batch iterator over a dataset.

    Yields dicts of stacked numpy arrays with leading dim
    `global_batch`; wraps around indefinitely (the train loop runs a
    fixed number of iterations, like the reference's re-initialised
    iterator at train.py:156-159).
    """

    def __init__(self, dataset, global_batch: int, shuffle=True, seed=0,
                 num_workers: int = 8, prefetch: int = 4):
        self.dataset = dataset
        self.global_batch = global_batch
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
            yield from order

    def __iter__(self):
        pool = concurrent.futures.ThreadPoolExecutor(self.num_workers)
        stream = self._index_stream()

        def make_batch_async():
            idxs = [next(stream) for _ in range(self.global_batch)]
            return [pool.submit(self.dataset.__getitem__, i) for i in idxs]

        pending = [make_batch_async() for _ in range(self.prefetch)]
        try:
            while True:
                futures = pending.pop(0)
                pending.append(make_batch_async())
                items = [f.result() for f in futures]
                batch = {k: np.stack([it[k] for it in items])
                         for k in items[0]}
                yield batch
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
