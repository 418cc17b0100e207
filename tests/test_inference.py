import numpy as np
import jax
import jax.numpy as jnp

from spml_tpu.config import load_config
from spml_tpu.inference import engine as engine_lib
from spml_tpu.inference import msc as msc_lib
from spml_tpu.models.embeddings import build_embedding_model
from spml_tpu.utils import metrics, vis


def _engine(crop=32, stride=24, image_size=0):
    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [3, 3],
                    "kmeans_iterations": 5},
        "dataset": {"num_classes": 4},
        "test": {"crop_size": [crop, crop], "stride": [stride, stride],
                 "image_size": image_size},
        "tpu": {"compute_dtype": "float32"},
    })
    model = build_embedding_model(cfg.network.backbone_types,
                                  cfg.network.embedding_dim)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 3)), train=False)
    return engine_lib.InferenceEngine(cfg, model, variables), cfg


def test_patch_ends_cover_image():
    ends = engine_lib.patch_ends(100, 40, 30)
    assert ends[0] == 40 and ends[-1] == 100
    # every pixel covered
    covered = np.zeros(100, bool)
    for e in ends:
        covered[e - 40:e] = True
    assert covered.all()


def test_sliding_window_overlap_average_is_normalized_scale():
    eng, _ = _engine(crop=32, stride=16)
    img = np.random.RandomState(0).randn(48, 40, 3).astype(np.float32)
    emb = eng.stitched_embeddings(img)
    # 40 buckets up to crop + k*stride = 48 (shape-bucketed padding)
    assert emb.shape[:2] == (48, 48)
    # overlap-averaged normalized embeddings have norm <= 1
    norms = np.linalg.norm(emb, axis=-1)
    assert norms.max() <= 1.0 + 1e-5
    assert norms.min() > 0.1  # averaging similar patches shouldn't cancel


def test_prototype_roundtrip_predicts_self(tmp_path):
    """Build a memory bank from an image with block labels, then KNN
    inference on the SAME image must reproduce those labels well."""
    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(1)
    img = rng.randn(32, 32, 3).astype(np.float32)
    gt = np.zeros((32, 32), np.int32)
    gt[:, 16:] = 1
    protos, labels, valid = eng.build_prototypes(img, gt)
    assert protos.shape[0] == 9  # 3x3 cluster grid
    # save/load memory bank files; tile 20 "images" so the top-20
    # retrieval is dominated by exact self-matches (the reference counts
    # on a large train-split memory for the same reason)
    for i in range(20):
        engine_lib.save_prototypes(str(tmp_path / f"img{i}.npy"),
                                   protos[valid], labels[valid])
    mp, ml = engine_lib.load_memory_banks(str(tmp_path))
    assert mp.shape[0] == 20 * int(valid.sum())

    pred = eng.predict_semantic(
        img, jnp.asarray(mp), jnp.asarray(ml),
        jnp.ones((mp.shape[0],), bool))
    assert pred.shape == (32, 32)
    # prediction == per-cluster majority GT label; only the middle
    # cluster column straddles the label boundary
    acc = (pred == gt).mean()
    assert acc > 0.7, f"self-retrieval accuracy too low: {acc}"


def test_msc_probs_average():
    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(2)
    img = rng.randn(32, 32, 3).astype(np.float32)
    gt = np.zeros((32, 32), np.int32)
    gt[16:, :] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)

    probs = msc_lib.msc_predict_probs(
        lambda im: eng.predict_topk_probs(im, mp, ml, mv),
        img, scales=[0.75, 1.0], is_flip=True)
    assert probs.shape == (32, 32, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    acc = (probs.argmax(-1) == gt).mean()
    assert acc > 0.7


def test_fused_member_program_matches_eager():
    """The one-dispatch fused member program (pad->patches->embed->
    stitch->cluster->probs) equals the original eager-stitched path,
    including on a ragged image that needs padding and a multi-patch
    sliding window."""
    eng, cfg = _engine(crop=32, stride=16)
    rng = np.random.RandomState(5)
    img = rng.randn(40, 33, 3).astype(np.float32)
    gt = np.zeros((40, 33), np.int32)
    gt[20:, :] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)

    fused = eng.predict_topk_probs(img, mp, ml, mv, fused=True)
    eager = eng.predict_topk_probs(img, mp, ml, mv, fused=False)
    assert fused.shape == eager.shape == (40, 33, 4)
    np.testing.assert_allclose(fused, eager, rtol=1e-4, atol=1e-5)


def test_msc_device_pyramid_matches_host():
    """msc_predict_probs_device (base uploaded once, scale-resize + flip
    inside the fused member program) == the host-resize bucketed path
    when the host resize uses the same half-pixel bilinear kernel
    (cv2.INTER_LINEAR semantics — what the device computes and what the
    reference uses; PIL antialiases on downscale, hence the oracle)."""
    from unittest import mock

    from spml_tpu.data import transforms

    def oracle_resize(img, nh, nw):
        h, w = img.shape[:2]

        def w_axis(n_out, n_in):
            src = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                          0, n_in - 1)
            y = np.arange(n_in)
            return np.maximum(
                0.0, 1.0 - np.abs(src[:, None] - y[None, :]))

        wr = w_axis(nh, h).astype(np.float32)
        wc = w_axis(nw, w).astype(np.float32)
        if img.ndim == 2:
            return wr @ img @ wc.T
        return np.einsum("oi,iwc,pw->opc", wr, img, wc)

    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(6)
    img = rng.randn(30, 32, 3).astype(np.float32)
    gt = np.zeros((30, 32), np.int32)
    gt[15:, :] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)
    memory = (mp, ml, mv)
    scales = [0.75, 1.0, 1.25]

    device = msc_lib.msc_predict_probs_device(
        eng, img, memory, scales=scales, is_flip=True,
        transfer_dtype=np.float32)
    with mock.patch.object(transforms, "_resize_image", oracle_resize):
        host = msc_lib.msc_predict_probs_bucketed(
            lambda im: eng.predict_topk_probs(im, *memory,
                                              bucket_out=True),
            img, scales=scales, bucket_shape=eng.bucket_shape,
            is_flip=True)
    assert device.shape == host.shape == (30, 32, 4)
    np.testing.assert_allclose(device, host, rtol=1e-4, atol=1e-5)


def test_msc_device_probs_async_matches_sync():
    """msc_predict_probs_device_async's resolve() is bit-identical to
    the sync msc_predict_probs_device — including when resolve() runs
    on another thread, the way runner._AsyncSink calls it for the CRF
    MSC paths (overlapping the prob download with the next image's
    dispatch)."""
    import concurrent.futures

    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(7)
    img = rng.randn(30, 32, 3).astype(np.float32)
    gt = np.zeros((30, 32), np.int32)
    gt[15:, :] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)
    memory = (mp, ml, mv)
    scales = [0.75, 1.0]

    sync = msc_lib.msc_predict_probs_device(
        eng, img, memory, scales=scales, is_flip=True)
    resolve = msc_lib.msc_predict_probs_device_async(
        eng, img, memory, scales=scales, is_flip=True)
    with concurrent.futures.ThreadPoolExecutor(1) as pool:
        got = pool.submit(resolve).result()
    assert got.shape == sync.shape and got.dtype == sync.dtype
    np.testing.assert_array_equal(got, sync)


def test_msc_device_labels_match_probs_path():
    """msc_predict_labels_device (resize-to-final + argmax on device,
    uint8 download) == downloading the fp32 probs, resizing to the final
    size with the same bilinear kernel, and argmaxing on host — the
    non-CRF MSC path's exactness contract."""
    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(7)
    img = rng.randn(30, 32, 3).astype(np.float32)
    gt = np.zeros((30, 32), np.int32)
    gt[10:, 5:] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)
    memory = (mp, ml, mv)
    scales = [0.75, 1.0]

    for final_hw in [(30, 32), (45, 57)]:
        probs = msc_lib.msc_predict_probs_device(
            eng, img, memory, scales=scales, is_flip=True,
            transfer_dtype=np.float32)
        acc = jnp.asarray(probs)
        fb = eng.bucket_shape(*final_hw)
        resized = msc_lib._resize_argmax(
            acc, jnp.asarray(probs.shape[:2], jnp.int32),
            jnp.asarray(final_hw, jnp.int32), final_bucket=fb)
        expect = np.asarray(resized)[:final_hw[0], :final_hw[1]]
        got = msc_lib.msc_predict_labels_device(
            eng, img, memory, scales=scales, is_flip=True,
            final_hw=final_hw)
        assert got.shape == final_hw and got.dtype == np.uint8
        np.testing.assert_array_equal(got, expect)


def test_resize_argmax_oracle():
    """_resize_argmax == numpy bilinear resize (half-pixel centers,
    edge clamp) + argmax, including the identity-size case."""
    rng = np.random.RandomState(8)
    acc = rng.rand(16, 20, 5).astype(np.float32)

    def w_axis(n_out, n_in):
        src = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                      0, n_in - 1)
        y = np.arange(n_in)
        return np.maximum(0.0, 1.0 - np.abs(src[:, None] - y[None, :]))

    for fh, fw in [(16, 20), (31, 9)]:
        wr = w_axis(fh, 16).astype(np.float32)
        wc = w_axis(fw, 20).astype(np.float32)
        expect = np.einsum("oi,iwc,pw->opc", wr, acc, wc).argmax(-1)
        got = msc_lib._resize_argmax(
            jnp.asarray(acc), jnp.asarray([16, 20], jnp.int32),
            jnp.asarray([fh, fw], jnp.int32), final_bucket=(fh, fw))
        np.testing.assert_array_equal(np.asarray(got), expect)


def test_fused_predict_and_prototype_match_eager():
    """The single-program predict_semantic / build_prototypes paths
    equal the eager-stitched originals (ragged image, multi-patch
    window)."""
    eng, cfg = _engine(crop=32, stride=16)
    rng = np.random.RandomState(8)
    img = rng.randn(40, 33, 3).astype(np.float32)
    gt = np.zeros((40, 33), np.int32)
    gt[20:, :] = 2
    gt[5, 5] = 255  # some ignore pixels

    pf = eng.build_prototypes(img, gt, return_clusters=True, fused=True)
    pe = eng.build_prototypes(img, gt, return_clusters=True, fused=False)
    np.testing.assert_allclose(pf[0], pe[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(pf[1], pe[1])
    np.testing.assert_array_equal(pf[2], pe[2])
    np.testing.assert_array_equal(pf[3], pe[3])

    protos, labels, valid = pf[:3]
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)
    pred_f = eng.predict_semantic(img, mp, ml, mv, fused=True)
    pred_e = eng.predict_semantic(img, mp, ml, mv, fused=False)
    np.testing.assert_array_equal(pred_f, pred_e)


def test_softmax_msc_device_pyramid_matches_host():
    """Same device-pyramid == host-oracle-resize parity for the softmax
    engine (stage-2 classifier inference)."""
    from unittest import mock

    from spml_tpu.data import transforms
    from spml_tpu.inference.softmax import SoftmaxInferenceEngine
    from spml_tpu.models.embeddings import ClassifierHead

    def oracle_resize(img, nh, nw):
        h, w = img.shape[:2]

        def w_axis(n_out, n_in):
            src = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                          0, n_in - 1)
            y = np.arange(n_in)
            return np.maximum(
                0.0, 1.0 - np.abs(src[:, None] - y[None, :]))

        wr = w_axis(nh, h).astype(np.float32)
        wc = w_axis(nw, w).astype(np.float32)
        if img.ndim == 2:
            return wr @ img @ wc.T
        return np.einsum("oi,iwc,pw->opc", wr, img, wc)

    eng, cfg = _engine(crop=32, stride=32)
    cls_model = ClassifierHead(num_classes=4, hidden_dim=16,
                               dropout_rate=0.75)
    cvars = cls_model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 8, 8, 8)), train=False)
    seng = SoftmaxInferenceEngine(cfg, eng.emb_model, eng.variables,
                                  cls_model, cvars)
    rng = np.random.RandomState(7)
    img = rng.randn(30, 32, 3).astype(np.float32)
    scales = [0.75, 1.0, 1.25]

    device = msc_lib.msc_predict_probs_device(
        seng, img, (), scales=scales, is_flip=True,
        transfer_dtype=np.float32)
    with mock.patch.object(transforms, "_resize_image", oracle_resize):
        host = msc_lib.msc_predict_probs_bucketed(
            lambda im: seng.predict_probs(im, bucket_out=True),
            img, scales=scales, bucket_shape=seng.bucket_shape,
            is_flip=True)
    assert device.shape == host.shape == (30, 32, 4)
    np.testing.assert_allclose(device, host, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(device.sum(-1), 1.0, atol=1e-4)


def test_miou_hand_computed():
    m = metrics.MeanIoU(3)
    pred = np.array([[0, 0], [1, 2]])
    gt = np.array([[0, 1], [1, 255]])
    m.update(pred, gt)
    r = m.result()
    # class0: tp1 fp1 fn0 -> .5 ; class1: tp1 fp0 fn1 -> .5 ; class2: 0/0+1fp -> 0
    np.testing.assert_allclose(r["class_iou"], [0.5, 0.5, 0.0])
    np.testing.assert_allclose(r["pixel_accuracy"], 2 / 3)


def test_instance_weighted_iou():
    m = metrics.InstanceWeightedIoU(2)
    gt_sem = np.array([[1, 1, 1, 1]])
    gt_inst = np.array([[0, 0, 1, 1]])
    pred = np.array([[1, 1, 1, 0]])
    m.update(pred, gt_sem, gt_inst)
    r = m.result()
    # inst0: inter {c0,c1}=2, union {c0,c1,c2}=3 -> 2/3
    # inst1: inter {c2}=1, union {c0..c3}=4 -> 1/4
    np.testing.assert_allclose(r["class_iou"][1], (2 / 3 + 1 / 4) / 2)


def test_voc_colormap_known_values():
    cmap = vis.voc_colormap()
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])
    np.testing.assert_array_equal(cmap[15], [192, 128, 128])
    np.testing.assert_array_equal(cmap[255], [224, 224, 192])


def test_checkpoint_roundtrip(tmp_path):
    from spml_tpu.utils import checkpoint as ckpt
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    ckpt.save(str(tmp_path / "ck"), 3, tree)
    assert ckpt.latest_step(str(tmp_path / "ck")) == 3
    template = jax.tree.map(jnp.zeros_like, tree)
    restored = ckpt.restore(str(tmp_path / "ck"), template)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]),
                                  np.ones((2, 2)))


def test_resize_accumulate_matches_bilinear():
    """msc._resize_accumulate (bucket-static matmul bilinear with traced
    valid sizes + source-reversed unflip) == resize-then-unflip with the
    repo's cv2-equivalent resize kernel, on the valid region."""
    from spml_tpu.models.spp import resize_bilinear

    rng = np.random.RandomState(3)
    in_b, out_b = (12, 16), (10, 14)
    in_hw, out_hw = (9, 13), (7, 11)
    probs = np.zeros(in_b + (3,), np.float32)
    valid = rng.rand(*in_hw, 3).astype(np.float32)
    probs[:in_hw[0], :in_hw[1]] = valid

    for flip in (False, True):
        expected = np.asarray(resize_bilinear(
            jnp.asarray(valid)[None], out_hw)[0])
        if flip:
            expected = expected[:, ::-1]
        acc = jnp.zeros(out_b + (3,), jnp.float32)
        out = msc_lib._resize_accumulate(
            acc, jnp.asarray(probs), jnp.asarray(in_hw, jnp.int32),
            jnp.asarray(out_hw, jnp.int32), out_bucket=out_b, flip=flip)
        np.testing.assert_allclose(
            np.asarray(out)[:out_hw[0], :out_hw[1]], expected,
            rtol=1e-5, atol=1e-5)
    # accumulation: calling twice doubles
    out2 = msc_lib._resize_accumulate(
        out, jnp.asarray(probs), jnp.asarray(in_hw, jnp.int32),
        jnp.asarray(out_hw, jnp.int32), out_bucket=out_b, flip=True)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out),
                               rtol=1e-6)


def test_msc_bucketed_equals_plain():
    """msc_predict_probs_bucketed == msc_predict_probs on the same
    engine (both resize with the cv2-equivalent kernel)."""
    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(2)
    img = rng.randn(30, 32, 3).astype(np.float32)
    gt = np.zeros((30, 32), np.int32)
    gt[15:, :] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)

    plain = msc_lib.msc_predict_probs(
        lambda im: eng.predict_topk_probs(im, mp, ml, mv,
                                          device_out=True),
        img, scales=[0.75, 1.0], is_flip=True)
    bucketed = msc_lib.msc_predict_probs_bucketed(
        lambda im: eng.predict_topk_probs(im, mp, ml, mv,
                                          bucket_out=True),
        img, scales=[0.75, 1.0], bucket_shape=eng.bucket_shape,
        is_flip=True)
    assert bucketed.shape == plain.shape == (30, 32, 4)
    np.testing.assert_allclose(bucketed, plain, rtol=1e-4, atol=1e-5)


def test_fused_member_pair_matches_singles():
    """predict_member_pair_probs (both flips in one program, shared
    embed batch) == two predict_member_probs calls, for every scale in
    a small pyramid."""
    eng, cfg = _engine(crop=32, stride=32)
    rng = np.random.RandomState(9)
    img = rng.randn(30, 32, 3).astype(np.float32)
    gt = np.zeros((30, 32), np.int32)
    gt[12:, 7:] = 2
    protos, labels, valid = eng.build_prototypes(img, gt)
    mp = jnp.asarray(np.tile(protos[valid], (20, 1)))
    ml = jnp.asarray(np.tile(labels[valid], 20))
    mv = jnp.ones((20 * int(valid.sum()),), bool)

    h, w = img.shape[:2]
    base_b = eng.bucket_shape(h, w)
    from spml_tpu.data import transforms
    base = transforms.resize_with_pad(img, base_b, 0.0)
    base_dev = eng.upload_image(base)
    base_hw = jnp.asarray([h, w], jnp.int32)

    for scale in (0.75, 1.0, 1.25):
        member_hw = (int(h * scale), int(w * scale))
        pair = np.asarray(eng.predict_member_pair_probs(
            base_dev, base_hw, member_hw, mp, ml, mv))
        for f in (False, True):
            single = np.asarray(eng.predict_member_probs(
                base_dev, base_hw, member_hw, f, mp, ml, mv))
            np.testing.assert_allclose(pair[int(f)], single,
                                       rtol=1e-5, atol=1e-6)
