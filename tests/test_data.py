import numpy as np
import PIL.Image
import pytest

from spml_tpu.data import datasets, transforms


@pytest.fixture
def voc_dir(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        h, w = 40 + i * 7, 60 - i * 5
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        sem = rng.randint(0, 5, (h, w)).astype(np.uint8)
        sem[0, 0] = 255
        inst = rng.randint(0, 7, (h, w)).astype(np.uint8)
        PIL.Image.fromarray(img).save(tmp_path / f"img{i}.png")
        PIL.Image.fromarray(sem).save(tmp_path / f"sem{i}.png")
        PIL.Image.fromarray(inst).save(tmp_path / f"inst{i}.png")
        lines.append(f"img{i}.png sem{i}.png inst{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_train_pipeline_shapes_and_tags(voc_dir):
    ds = datasets.ListTagDataset(
        str(voc_dir), str(voc_dir / "list.txt"),
        img_mean=(0.485, 0.456, 0.406), img_std=(0.229, 0.224, 0.225),
        size=(64, 64), random_crop=True, random_scale=True,
        random_mirror=True, training=True)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["semantic_label"].shape == (64, 64)
    assert item["instance_label"].shape == (64, 64)
    assert item["semantic_tag"].shape == (256,)
    # tags reflect the ORIGINAL label map's unique values
    sem_orig = np.array(PIL.Image.open(voc_dir / "sem0.png"))
    want = np.zeros(256, np.int32)
    want[np.unique(sem_orig)] = 1
    np.testing.assert_array_equal(item["semantic_tag"], want)
    # determinism per (seed, idx)
    item2 = ds[0]
    np.testing.assert_array_equal(item["image"], item2["image"])


def test_label_padding_is_ignore(voc_dir):
    ds = datasets.ListDataset(
        str(voc_dir), str(voc_dir / "list.txt"), size=(128, 128),
        random_crop=True, random_scale=False, random_mirror=False,
        training=True)
    item = ds[0]  # image 40x60 -> heavy padding
    assert (item["semantic_label"] == 255).sum() > 0
    # padded image area normalizes to (0 - mean)/std, here mean=0 std=1 -> 0
    assert np.all(item["image"][-1, -1] == 0)


def test_eval_resize_with_pad(voc_dir):
    ds = datasets.ListDataset(
        str(voc_dir), str(voc_dir / "list.txt"), size=(64, 64),
        training=False)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    # eval keeps original label resolution
    assert item["semantic_label"].shape == (40, 60)


def test_densepose_flip_remap_swaps_left_right():
    remap = datasets.DENSEPOSE_FLIP_REMAP
    assert remap[2] == 3 and remap[3] == 2      # hands
    assert remap[4] == 5 and remap[5] == 4      # feet
    assert remap[10] == 11 and remap[11] == 10  # arms
    assert remap[14] == 14 and remap[0] == 0


def test_loader_batches(voc_dir):
    ds = datasets.ListTagDataset(
        str(voc_dir), str(voc_dir / "list.txt"), size=(32, 32),
        random_crop=True, random_scale=True, random_mirror=True,
        training=True)
    loader = iter(datasets.Loader(ds, global_batch=4, num_workers=2,
                                  prefetch=2))
    for _ in range(3):
        batch = next(loader)
        assert batch["image"].shape == (4, 32, 32, 3)
        assert batch["semantic_tag"].shape == (4, 256)


def test_classifier_augmentation_runs(voc_dir):
    ds = datasets.ListTagClassifierDataset(
        str(voc_dir), str(voc_dir / "list.txt"), size=(32, 32),
        random_crop=True, random_scale=True, random_mirror=True,
        training=True, seed=3)
    for i in range(3):
        item = ds[i]
        assert item["image"].shape == (32, 32, 3)
        assert np.isfinite(item["image"]).all()


def test_resize_with_interpolation_larger_side():
    img = np.zeros((40, 80, 3), np.float32)
    out = transforms.resize_with_interpolation(img, 160)
    assert out.shape[:2] == (80, 160)
    img2 = np.zeros((80, 40, 3), np.float32)
    out2 = transforms.resize_with_interpolation(img2, 160)
    assert out2.shape[:2] == (160, 80)
