"""Data-parallel bulk KNN inference (engine.predict_semantic_batch):
the vmapped, mesh-sharded group program must be bit-identical to the
per-image predict_semantic path for same-bucket images, on both a
single device and an 8-device 'data' mesh.

No reference counterpart — twke18/SPML's inference.py:114-228 is a
strictly per-image, single-GPU loop.
"""

import numpy as np
import jax
import pytest

from spml_tpu.parallel import mesh as mesh_lib
from tests.test_cli_pipeline import tiny_world  # noqa: F401 (fixture)
from tests.test_inference import _engine


def _memory(rng, n=40, dim=8, num_classes=4):
    mp = rng.randn(n, dim).astype(np.float32)
    mp /= np.linalg.norm(mp, axis=-1, keepdims=True)
    ml = rng.randint(0, num_classes, (n,)).astype(np.int32)
    mv = np.ones((n,), bool)
    return mp, ml, mv


def _images(rng, shapes):
    return [rng.rand(h, w, 3).astype(np.float32) for h, w in shapes]


@pytest.mark.parametrize("use_mesh", [False, True])
def test_batch_matches_per_image(use_mesh):
    eng, _ = _engine()
    rng = np.random.RandomState(0)
    memory = _memory(rng)
    # 3 images in one 32x32 bucket (group padded to 4 on the mesh) and
    # 2 in a larger bucket — mixed valid sizes within a bucket
    shapes = [(32, 32), (30, 28), (25, 32), (50, 40), (56, 44)]
    images = _images(rng, shapes)

    singles = [eng.predict_semantic(im, *memory) for im in images]

    mesh = (mesh_lib.make_mesh(devices=jax.devices("cpu"))
            if use_mesh else None)
    small = images[:3]
    big = images[3:]
    batched = (eng.predict_semantic_batch(small, *memory, mesh=mesh)
               + eng.predict_semantic_batch(big, *memory, mesh=mesh))

    for s, b in zip(singles, batched):
        assert s.shape == b.shape
        np.testing.assert_array_equal(s, b)


def test_knn_inference_cli_batched_identical(tiny_world):
    """The real CLI path (runner.run_knn_inference) with
    tpu.infer_batch=2 writes byte-identical PNGs to the per-image
    path."""
    import os
    import shutil

    import PIL.Image

    from spml_tpu.inference import runner

    args, cfg = tiny_world
    runner.run_prototype(args, cfg)
    proto_dir = os.path.join(args.save_dir, "semantic_prototype")
    for f in list(os.listdir(proto_dir)):
        for k in range(9):
            shutil.copy(os.path.join(proto_dir, f),
                        os.path.join(proto_dir, f"{k}_{f}"))

    runner.run_knn_inference(args, cfg)
    gray = os.path.join(args.save_dir, "semantic_gray")
    ref = {f: np.array(PIL.Image.open(os.path.join(gray, f)))
           for f in os.listdir(gray)}
    assert len(ref) == 3
    shutil.rmtree(gray)

    cfg.tpu.infer_batch = 2
    runner.run_knn_inference(args, cfg)
    assert set(os.listdir(gray)) == set(ref)
    for f, want in ref.items():
        got = np.array(PIL.Image.open(os.path.join(gray, f)))
        np.testing.assert_array_equal(got, want)


def test_runner_batcher_groups_by_bucket():
    """_PredictBatcher groups per bucket and saves every image exactly
    once, including remainder flushes."""
    from spml_tpu.inference.runner import _PredictBatcher

    eng, _ = _engine()
    rng = np.random.RandomState(1)
    memory = _memory(rng)
    shapes = [(32, 32), (30, 28), (25, 32), (50, 40), (56, 44)]
    images = _images(rng, shapes)
    singles = {f"im{i}": eng.predict_semantic(im, *memory)
               for i, im in enumerate(images)}

    saved = {}

    def save(pred, base, oh, ow):
        assert base not in saved
        assert pred.shape == (oh, ow)
        saved[base] = pred

    b = _PredictBatcher(eng, memory, group_size=2, save=save)
    for i, im in enumerate(images):
        b.add(f"im{i}", im, *im.shape[:2])
    b.flush_all()

    assert set(saved) == set(singles)
    for base in singles:
        np.testing.assert_array_equal(saved[base], singles[base])


def test_batch_empty_list_returns_empty():
    """Public-API guard: an empty image group is a no-op, not a crash."""
    eng, _ = _engine()
    rng = np.random.RandomState(0)
    memory = _memory(rng)
    assert eng.predict_semantic_batch([], *memory) == []
