import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spml_tpu.config import load_config
from spml_tpu.parallel import mesh as mesh_lib
from spml_tpu.train import optim, step as step_lib


def _tiny_config(batch=2, crop=32, mem=1):
    return load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 3},
        "dataset": {"num_classes": 4},
        "train": {"batch_size": batch, "crop_size": [crop, crop],
                  "memory_bank_size": mem, "max_iteration": 100,
                  "warmup_iteration": 10, "base_lr": 3e-3},
        "tpu": {"segment_capacity": 32, "compute_dtype": "float32"},
    })


def _batch(rng, b, crop, c=4):
    return {
        "image": jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32),
        "semantic_label": jnp.asarray(
            rng.randint(0, c + 1, (b, crop, crop)), jnp.int32),
        "instance_label": jnp.asarray(
            rng.randint(0, 4, (b, crop, crop)), jnp.int32),
        "semantic_tag": jnp.asarray(rng.rand(b, 256) > 0.6, jnp.int32),
    }


def test_lr_poly_matches_reference_formula():
    # reference spml/utils/general/train.py:8-27
    base, max_iter, warm = 3e-3, 30000, 100
    sched = optim.lr_poly(base, max_iter, warm)
    for it in [0, 10, 50, 99, 100, 1000, 29999]:
        if it < warm:
            alpha = it / warm
            want = min(base * (0.1 * (1 - alpha) + alpha),
                       base * (1 - it / max_iter) ** 0.9)
        else:
            want = base * (1 - it / max_iter) ** 0.9
        # fp32 cancellation in (1 - it/max_iter) at the last steps
        np.testing.assert_allclose(float(sched(it)), want, rtol=1e-3)


def test_param_group_labels():
    lab = optim.label_param
    assert lab(("embedding", "resnet_backbone", "stem", "conv1_1", "conv",
                "kernel")) == optim.FROZEN
    assert lab(("embedding", "resnet_backbone", "res2", "block0", "conv1",
                "conv", "kernel")) == optim.FROZEN
    assert lab(("embedding", "resnet_backbone", "res3", "block0", "conv1",
                "conv", "kernel")) == optim.BACKBONE_W
    assert lab(("embedding", "resnet_backbone", "res5", "block0", "conv2",
                "bn", "scale")) == optim.BACKBONE_W
    assert lab(("embedding", "resnet_backbone", "res4", "block1", "conv3",
                "bn", "bias")) == optim.BACKBONE_B
    assert lab(("embedding", "aspp", "aspp_1", "kernel")) == optim.HEAD_W
    assert lab(("embedding", "aspp", "aspp_4", "bias")) == optim.HEAD_B
    assert lab(("prediction", "conv2", "bias")) == optim.HEAD_B


def test_frozen_params_do_not_move():
    cfg = _tiny_config()
    rng = np.random.RandomState(0)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))
    p0 = state.params
    state, metrics = step(state, _batch(rng, 2, 32))
    assert np.isfinite(float(metrics["loss"]))
    stem0 = p0["embedding"]["resnet_backbone"]["stem"]
    stem1 = state.params["embedding"]["resnet_backbone"]["stem"]
    for a, b in zip(jax.tree.leaves(stem0), jax.tree.leaves(stem1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainable parts DID move
    r3_0 = jax.tree.leaves(p0["embedding"]["resnet_backbone"]["res3"])
    r3_1 = jax.tree.leaves(
        state.params["embedding"]["resnet_backbone"]["res3"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(r3_0, r3_1))


def test_memory_bank_fifo_and_batch_offsets():
    cfg = _tiny_config(mem=2)
    rng = np.random.RandomState(1)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))
    assert not bool(state.memory.valid.any())
    state, _ = step(state, _batch(rng, 2, 32))
    m1 = state.memory
    # newest slot is the last; it must hold this step's prototypes
    assert bool(m1.valid[-1].any())
    assert not bool(m1.valid[0].any())
    # batch indices offset by one global batch (B=2)
    newest_idx = np.asarray(m1.batch_index[-1])
    valid = np.asarray(m1.valid[-1])
    assert set(np.unique(newest_idx[valid])) <= {2, 3}
    state, _ = step(state, _batch(rng, 2, 32))
    m2 = state.memory
    # previous entry aged: offsets grew by another global batch
    aged = np.asarray(m2.batch_index[0])
    assert set(np.unique(aged[np.asarray(m2.valid[0])])) <= {4, 5}


@pytest.mark.slow
def test_multichip_equals_singlechip():
    """The SyncBN-suite idea from the reference
    (lib/nn/sync_batchnorm/tests/test_sync_batchnorm.py): N-device
    sharded execution must numerically match the 1-device oracle on the
    same global batch."""
    cfg = _tiny_config(batch=8, crop=32)
    rng = np.random.RandomState(2)
    batch = _batch(rng, 8, 32)
    img = jnp.zeros((8, 32, 32, 3))

    results = {}
    for n_dev in (1, 8):
        mesh = mesh_lib.make_mesh(num_devices=n_dev,
                                  devices=jax.devices("cpu"))
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
        state = mesh_lib.device_put_replicated(state, mesh)
        data = mesh_lib.device_put_batch(dict(batch), mesh)
        step = mesh_lib.shard_train_step(
            step_lib.make_train_step(cfg), mesh)
        state, metrics = step(state, data)
        results[n_dev] = (jax.device_get(state.params),
                          {k: float(v) for k, v in metrics.items()})

    p1, m1 = results[1]
    p8, m8 = results[8]
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-4)
    np.testing.assert_allclose(m1["num_segments"], m8["num_segments"])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_empty_segments_do_not_nan_gradients():
    """Regression: empty segment-capacity slots produce zero-vector
    prototypes whose L2-normalize must not emit NaN in the backward pass
    (sqrt'(0) * 0 trap)."""
    cfg = _tiny_config(batch=2, crop=32)
    cfg.tpu.segment_capacity = 64  # far more slots than actual segments
    rng = np.random.RandomState(5)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))
    batch = _batch(rng, 2, 32)
    # few distinct labels -> few segments -> many empty slots
    batch["semantic_label"] = jnp.zeros((2, 32, 32), jnp.int32)
    batch["instance_label"] = jnp.zeros((2, 32, 32), jnp.int32)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["num_segments"]) < 64
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def _densepose_config(**tpu_extra):
    return load_config(overrides={
        "network": {"backbone_types": "panoptic_pspnet_101_densepose",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 2},
        "dataset": {"num_classes": 15},
        "train": {"batch_size": 2, "crop_size": [32, 32],
                  "memory_bank_size": 0, "max_iteration": 100,
                  "warmup_iteration": 10,
                  "sem_occ_loss_types": "none",
                  "feat_aff_loss_types": "segsort",
                  "feat_aff_concentration": 12.0,
                  "feat_aff_loss_weight": 0.5},
        "tpu": {"segment_capacity": 32, "compute_dtype": "float32",
                **tpu_extra},
    })


def test_densepose_step_runs_with_nn_tags():
    """DensePose variant with tpu.apply_feat_aff=True (paper-semantics
    mode): NN-propagated tags drive feat_aff; color+location local
    features; plain-embedding img_sim."""
    cfg = _densepose_config(apply_feat_aff=True)
    rng = np.random.RandomState(7)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    # densepose local features: 2 loc + 3 color
    assert state.memory.prototype_with_loc.shape[-1] == 8 + 5
    step = jax.jit(step_lib.make_train_step(cfg))
    batch = _batch(rng, 2, 32, c=15)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "feat_aff_loss" in metrics
    assert np.isfinite(float(metrics["feat_aff_loss"]))
    assert "sem_occ_loss" not in metrics


def test_densepose_default_matches_reference_effective_objective():
    """The DEFAULT densepose objective must equal the reference's
    EFFECTIVE one: feat_aff is constructed but never invoked there
    (segsort_softmax_densepose.py:64-68 vs :195-254), so with
    tpu.apply_feat_aff at its default (False) the shipped aff 12 / 0.5
    config must contribute nothing — bitwise the same step as
    feat_aff_loss_types='none'."""
    cfg_default = _densepose_config()
    assert cfg_default.tpu.apply_feat_aff is False
    cfg_none = _densepose_config()
    cfg_none.train.feat_aff_loss_types = "none"

    rng = np.random.RandomState(7)
    img = jnp.zeros((2, 32, 32, 3))
    batch = _batch(rng, 2, 32, c=15)
    results = []
    for cfg in (cfg_default, cfg_none):
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
        step = jax.jit(step_lib.make_train_step(cfg))
        state, metrics = step(state, batch)
        results.append((jax.device_get(state.params), metrics))
    (p_def, m_def), (p_none, m_none) = results
    assert "feat_aff_loss" not in m_def
    assert float(m_def["loss"]) == float(m_none["loss"])
    for a, b in zip(jax.tree.leaves(p_def), jax.tree.leaves(p_none)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_softmax_classifier_prediction_mode():
    """prediction_types='softmax_classifier': CE-only end-to-end baseline
    (reference train.py:92-93 + softmax_classifier.py, no detach)."""
    cfg = _tiny_config()
    cfg.network.prediction_types = "softmax_classifier"
    rng = np.random.RandomState(9)
    img = jnp.zeros((2, 32, 32, 3))
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))
    p0 = state.params
    state, metrics = step(state, _batch(rng, 2, 32))
    assert np.isfinite(float(metrics["loss"]))
    assert "img_sim_loss" not in metrics
    # CE gradient reaches the backbone (res3 moved)
    r3_0 = jax.tree.leaves(p0["embedding"]["resnet_backbone"]["res3"])
    r3_1 = jax.tree.leaves(
        state.params["embedding"]["resnet_backbone"]["res3"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(r3_0, r3_1))


def test_compact_feed_exact():
    """The compact feed (uint8 labels + compute-dtype image,
    driver._to_train_batch) produces the SAME step as the wide
    int32/float32 feed: uint8 holds every PNG 'L'-mode label value
    exactly, and with bf16 convs the model casts a float32 image to
    bf16 at the first conv anyway — so casting at the host boundary is
    the identical rounding, just 4x fewer transferred bytes."""
    import ml_dtypes

    from spml_tpu.train.driver import _to_train_batch

    cfg = _tiny_config()
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.compact_feed = True
    rng = np.random.RandomState(11)
    b, crop = 2, 32
    img = jnp.zeros((b, crop, crop, 3))
    state0 = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))

    wide = {
        "image": rng.randn(b, crop, crop, 3).astype(np.float32),
        "semantic_label": rng.randint(
            0, 5, (b, crop, crop)).astype(np.int32),
        "instance_label": rng.randint(
            0, 4, (b, crop, crop)).astype(np.int32),
        "semantic_tag": (rng.rand(b, 256) > 0.6).astype(np.int32),
    }
    compact = _to_train_batch(wide, cfg)
    assert compact["semantic_label"].dtype == np.uint8
    assert compact["image"].dtype == ml_dtypes.bfloat16

    s_wide, m_wide = step(state0, {k: jnp.asarray(v)
                                   for k, v in wide.items()})
    state0b = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    s_cpt, m_cpt = step(state0b, {k: jnp.asarray(v)
                                  for k, v in compact.items()})
    for k in m_wide:
        np.testing.assert_array_equal(np.asarray(m_wide[k]),
                                      np.asarray(m_cpt[k]), err_msg=k)
    for a, b_ in zip(jax.tree.leaves(s_wide.params),
                     jax.tree.leaves(s_cpt.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_lazy_metrics_only_on_logged_steps():
    """tpu.lazy_metrics computes the top-5 retrieval accuracy only when
    state.step % tensorboard_step == 0 (the only steps the driver reads
    it, matching the reference's log-every-tensorboard_step), and the
    logged-step value equals the eagerly-computed one."""
    cfg = _tiny_config()
    cfg.train.tensorboard_step = 2
    rng = np.random.RandomState(12)
    img = jnp.zeros((2, 32, 32, 3))
    batch = _batch(rng, 2, 32)

    cfg.tpu.lazy_metrics = True
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    step = jax.jit(step_lib.make_train_step(cfg))
    state, m0 = step(state, batch)   # step 0: logged
    state, m1 = step(state, batch)   # step 1: skipped
    state, m2 = step(state, batch)   # step 2: logged

    cfg2 = _tiny_config()
    cfg2.train.tensorboard_step = 2
    cfg2.tpu.lazy_metrics = False
    state_e = step_lib.init_state(cfg2, jax.random.PRNGKey(0), img)
    step_e = jax.jit(step_lib.make_train_step(cfg2))
    state_e, e0 = step_e(state_e, batch)
    state_e, e1 = step_e(state_e, batch)

    assert float(m1["accuracy"]) == 0.0       # skipped
    assert float(e1["accuracy"]) > 0.0        # eager computes it
    np.testing.assert_allclose(float(m0["accuracy"]),
                               float(e0["accuracy"]), rtol=1e-6)
    assert float(m2["accuracy"]) > 0.0        # logged step computes


def test_profiler_trace_window(tmp_path):
    """tpu.profile_dir captures a jax.profiler trace for profile_steps
    iterations starting at profile_start; trace files land on disk and
    training output is unaffected (the window only adds block_until_ready
    barriers)."""
    import argparse
    import glob

    import PIL.Image

    from spml_tpu.train import driver

    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    for sub in ("img", "sem", "inst"):
        (data / sub).mkdir(parents=True)
    lines = []
    for i in range(2):
        img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        sem = rng.randint(0, 4, (32, 32)).astype(np.uint8)
        inst = rng.randint(0, 4, (32, 32)).astype(np.uint8)
        PIL.Image.fromarray(img).save(data / "img" / f"im{i}.jpg")
        PIL.Image.fromarray(sem).save(data / "sem" / f"im{i}.png")
        PIL.Image.fromarray(inst).save(data / "inst" / f"im{i}.png")
        lines.append(f"data/img/im{i}.jpg data/sem/im{i}.png "
                     f"data/inst/im{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")

    cfg = _tiny_config(batch=1)
    cfg.train.max_iteration = 5
    cfg.train.snapshot_step = 5
    cfg.train.tensorboard_step = 10
    prof_dir = tmp_path / "trace"
    cfg.tpu.profile_dir = str(prof_dir)
    cfg.tpu.profile_start = 2
    cfg.tpu.profile_steps = 2

    args = argparse.Namespace(snapshot_dir=str(tmp_path / "snap"),
                              data_dir=str(tmp_path),
                              data_list=str(tmp_path / "list.txt"))
    driver.train_spml(args, cfg)

    traces = glob.glob(str(prof_dir / "**" / "*.xplane.pb"),
                       recursive=True) + glob.glob(
        str(prof_dir / "**" / "*.trace.json.gz"), recursive=True)
    assert traces, f"no trace files under {prof_dir}"


def test_remat_backbone_identical_step():
    """tpu.remat_backbone saves only residual-block boundaries and
    recomputes intra-block activations in backward. Recompute re-executes
    the same ops on the same values, so the step must be IDENTICAL —
    loss, metrics, and every updated parameter."""
    rng = np.random.RandomState(13)
    img = jnp.zeros((2, 32, 32, 3))
    batch = _batch(rng, 2, 32)

    results = []
    for remat in (False, True):
        cfg = _tiny_config()
        cfg.tpu.remat_backbone = remat
        state = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
        step = jax.jit(step_lib.make_train_step(cfg))
        state, metrics = step(state, batch)
        results.append((jax.device_get(state.params),
                        {k: float(v) for k, v in metrics.items()}))

    (p0, m0), (p1, m1) = results
    assert m0 == m1
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_stages_exactness():
    """Selective stage remat (tpu.remat_stages) is pure recompute: the
    stepped state must match the no-remat step up to reduction
    reassociation (XLA may reorder the recomputed sums).
    """
    rng = np.random.RandomState(7)
    img = jnp.zeros((2, 32, 32, 3))
    data = _batch(rng, 2, 32)

    cfg = _tiny_config()
    state0 = step_lib.init_state(cfg, jax.random.PRNGKey(0), img)
    s_ref, m_ref = jax.jit(step_lib.make_train_step(cfg))(state0, data)

    cfg_r = _tiny_config()
    cfg_r.tpu.remat_stages = (4, 5)
    state0r = step_lib.init_state(cfg_r, jax.random.PRNGKey(0), img)
    s_rm, m_rm = jax.jit(step_lib.make_train_step(cfg_r))(state0r, data)

    assert np.allclose(float(m_ref["loss"]), float(m_rm["loss"]),
                       rtol=1e-5), (m_ref["loss"], m_rm["loss"])
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            jax.tree_util.tree_leaves_with_path(s_rm.params)):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=str(p1))
