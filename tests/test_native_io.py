"""Parity tests: native/dataio fused C++ train-item vs the Python path.

The native path (spml_tpu/data/native_io.py + native/dataio/dataio.cc)
must produce the SAME item as the Python ListDataset pipeline for a
given (seed, index): decode/mirror/crop/normalize bitwise, bilinear
resize within float tolerance. Randomness stays in Python (the dataset
draws mirror/scale/crop and passes resolved parameters), so parity here
is a pure decode/arithmetic equivalence check.

Reference behavior under test: spml/data/datasets/base_dataset.py:102-155
and spml/data/transforms.py in twke18/SPML.
"""

import numpy as np
import PIL.Image
import pytest

from spml_tpu.data import datasets, native_io

pytestmark = pytest.mark.skipif(
    native_io.load_library() is None,
    reason="libdataio.so unavailable (no toolchain?)")

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _make_world(tmp_path, palette=False, n=3):
    """JPEG images + PNG labels, varied sizes; returns the data dir."""
    rng = np.random.RandomState(7)
    lines = []
    for i in range(n):
        h, w = 41 + i * 9, 67 - i * 6
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        sem = rng.randint(0, 21, (h, w)).astype(np.uint8)
        sem[0, :3] = 255
        inst = rng.randint(0, 9, (h, w)).astype(np.uint8)
        PIL.Image.fromarray(img).save(tmp_path / f"img{i}.jpg",
                                      quality=90)
        if palette:
            pal_img = PIL.Image.fromarray(sem, mode="P")
            # identity-luminance palette: entry v -> gray(v,v,v) == v
            pal_img.putpalette(bytes(bytearray(
                v for v in range(256) for _ in range(3))))
            pal_img.save(tmp_path / f"sem{i}.png")
        else:
            PIL.Image.fromarray(sem).save(tmp_path / f"sem{i}.png")
        PIL.Image.fromarray(inst).save(tmp_path / f"inst{i}.png")
        lines.append(f"img{i}.jpg sem{i}.png inst{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def _pair(tmp_path, cls=datasets.ListDataset, seed=0, **kw):
    """(native-enabled, python-forced) datasets over the same files."""
    kw.setdefault("img_mean", MEAN)
    kw.setdefault("img_std", STD)
    kw.setdefault("size", (64, 64))
    kw.setdefault("random_crop", True)
    kw.setdefault("training", True)
    ds_nat = cls(str(tmp_path), str(tmp_path / "list.txt"), seed=seed, **kw)
    ds_py = cls(str(tmp_path), str(tmp_path / "list.txt"), seed=seed, **kw)
    ds_py._native_item = lambda idx, rng: None  # force the Python path
    return ds_nat, ds_py


def test_native_path_actually_taken(tmp_path):
    world = _make_world(tmp_path)
    ds_nat, _ = _pair(world, random_mirror=True)
    rng = np.random.default_rng(np.random.SeedSequence([0, 0, 1]))
    assert ds_nat._native_item(0, rng) is not None


def test_bitwise_parity_no_scale(tmp_path):
    """Without resize every stage is bitwise: decode (same libjpeg
    algorithm as PIL), /255, mirror, pad, crop, normalize."""
    world = _make_world(tmp_path)
    ds_nat, ds_py = _pair(world, random_scale=False, random_mirror=True)
    for seed in range(4):
        ds_nat.seed = ds_py.seed = seed
        for i in range(3):
            a, b = ds_nat[i], ds_py[i]
            assert set(a) == set(b)
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["semantic_label"],
                                          b["semantic_label"])
            np.testing.assert_array_equal(a["instance_label"],
                                          b["instance_label"])


def test_parity_with_random_scale(tmp_path):
    """With resize the image matches within float tolerance (both sides
    run Pillow's convolution resampler; accumulation order may differ);
    labels are floor-index nearest on both sides — still exact."""
    world = _make_world(tmp_path)
    ds_nat, ds_py = _pair(world, random_scale=True, random_mirror=True)
    for seed in range(4):
        ds_nat.seed = ds_py.seed = seed
        for i in range(3):
            a, b = ds_nat[i], ds_py[i]
            np.testing.assert_allclose(a["image"], b["image"],
                                       atol=1e-5, rtol=0)
            np.testing.assert_array_equal(a["semantic_label"],
                                          b["semantic_label"])
            np.testing.assert_array_equal(a["instance_label"],
                                          b["instance_label"])


def test_tag_parity(tmp_path):
    world = _make_world(tmp_path)
    ds_nat, ds_py = _pair(world, cls=datasets.ListTagDataset,
                          random_scale=True, random_mirror=True)
    for i in range(3):
        a, b = ds_nat[i], ds_py[i]
        np.testing.assert_array_equal(a["semantic_tag"],
                                      b["semantic_tag"])
        assert a["semantic_tag"].dtype == b["semantic_tag"].dtype


def test_densepose_flip_remap_parity(tmp_path):
    """L/R remap applied post-crop on the native side must equal the
    Python pre-resize application (remap commutes with index selection;
    pad 255 is a fixed point)."""
    world = _make_world(tmp_path)
    ds_nat, ds_py = _pair(world, cls=datasets.DenseposeDataset,
                          random_scale=True, random_mirror=True)
    mirrored_any = False
    for seed in range(6):
        ds_nat.seed = ds_py.seed = seed
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, 0, 1]))
        mirrored_any |= rng.uniform(0, 1.0) >= 0.5
        a, b = ds_nat[0], ds_py[0]
        np.testing.assert_array_equal(a["semantic_label"],
                                      b["semantic_label"])
    assert mirrored_any  # at least one seed exercised the remap


def test_palette_png_labels(tmp_path):
    """Palette-mode PNGs go through PIL's convert('L') luminance map on
    both sides (base_dataset.py:112 semantics)."""
    world = _make_world(tmp_path, palette=True)
    ds_nat, ds_py = _pair(world, random_scale=False, random_mirror=True)
    a, b = ds_nat[0], ds_py[0]
    np.testing.assert_array_equal(a["semantic_label"],
                                  b["semantic_label"])
    # identity palette: original values survive the L conversion
    assert set(np.unique(a["semantic_label"])) <= set(range(21)) | {255}


def test_fallback_when_image_not_jpeg(tmp_path):
    """PNG images can't take the native path; item still works (Python
    fallback), proving the rng-rebuild in __getitem__ is sound."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (40, 50, 3), dtype=np.uint8)
    sem = rng.randint(0, 5, (40, 50)).astype(np.uint8)
    PIL.Image.fromarray(img).save(tmp_path / "a.png")
    PIL.Image.fromarray(sem).save(tmp_path / "a_sem.png")
    PIL.Image.fromarray(sem).save(tmp_path / "a_inst.png")
    (tmp_path / "list.txt").write_text("a.png a_sem.png a_inst.png\n")
    ds = datasets.ListDataset(
        str(tmp_path), str(tmp_path / "list.txt"), img_mean=MEAN,
        img_std=STD, size=(32, 32), random_crop=True, random_scale=True,
        random_mirror=True, training=True)
    rng = np.random.default_rng(np.random.SeedSequence([0, 0, 1]))
    assert ds._native_item(0, rng) is None
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)


def test_threaded_loader_determinism(tmp_path):
    """Items produced under the Loader's thread pool must be bitwise
    identical to serially-produced ones: the C++ item call is
    re-entrant (no shared mutable state) and GIL-free."""
    world = _make_world(tmp_path, n=6)
    ds, _ = _pair(world, random_scale=True, random_mirror=True)
    serial = [ds[i] for i in range(6)]
    loader = datasets.Loader(ds, global_batch=6, shuffle=False,
                             num_workers=8, prefetch=2)
    it = iter(loader)
    try:
        batch = next(it)
    finally:
        it.close()
    for i in range(6):
        np.testing.assert_array_equal(batch["image"][i],
                                      serial[i]["image"])
        np.testing.assert_array_equal(batch["semantic_label"][i],
                                      serial[i]["semantic_label"])


def test_eval_path_not_native(tmp_path):
    """training=False must never take the native path (it implements
    only the train pipeline)."""
    world = _make_world(tmp_path)
    ds = datasets.ListDataset(
        str(world), str(world / "list.txt"), img_mean=MEAN, img_std=STD,
        size=(64, 64), training=False)
    rng = np.random.default_rng(0)
    assert ds._native_item(0, rng) is None
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
