"""Round-trip lock for torch_export: export -> torch_import must
reproduce the original flax variables exactly, for both heads and the
classifier, including through a real .pth file.

Reference naming being targeted: the state dicts saved by
pyscripts/train/train.py:298-302 in twke18/SPML ('embedding_model' /
'prediction_model' keys, modules resnet_backbone.*, aspp.*/pspp.*,
semantic_classifier.*).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spml_tpu.models.embeddings import ClassifierHead, EmbeddingModel
from spml_tpu.utils import torch_export, torch_import


def _randomize(variables, seed):
    """Distinct random values in every leaf so silent drops/mixups
    cannot cancel out."""
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32)),
        variables)


def _emb_vars(head, seed):
    model = EmbeddingModel(depth=10, embedding_dim=8, head=head)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    return _randomize(v, seed)


def _assert_tree_equal(a, b):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("head", ["aspp", "pspp"])
def test_embedding_roundtrip(head):
    v = _emb_vars(head, seed=1)
    sd = torch_export.export_embedding_model(v)

    # every exported name must be understood by the importer (i.e. it is
    # a name the reference's modules would produce)
    for name in sd:
        if name.endswith("num_batches_tracked"):
            continue
        assert torch_import._flax_path(name) is not None, name

    params, stats = torch_import.convert_state_dict(sd)
    fresh = jax.tree.map(jnp.zeros_like, v)
    merged = torch_import.merge_pretrained(fresh, params, stats)
    _assert_tree_equal(merged["params"], v["params"])
    _assert_tree_equal(merged["batch_stats"], v["batch_stats"])

    # coverage: every flax leaf must have been exported (no silent gaps)
    n_leaves = len(jax.tree.leaves(v))
    n_exported = sum(1 for k in sd if not k.endswith(
        "num_batches_tracked"))
    assert n_exported == n_leaves


def test_classifier_roundtrip():
    model = ClassifierHead(num_classes=4, hidden_dim=16)
    v = _randomize(model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 8)), train=False),
                   seed=2)
    sd = torch_export.export_classifier_head(v)
    assert set(sd) == {
        "semantic_classifier.0.weight",
        "semantic_classifier.1.weight", "semantic_classifier.1.bias",
        "semantic_classifier.1.running_mean",
        "semantic_classifier.1.running_var",
        "semantic_classifier.1.num_batches_tracked",
        "semantic_classifier.4.weight", "semantic_classifier.4.bias",
    }
    params, stats = torch_import.convert_state_dict(sd)
    fresh = jax.tree.map(jnp.zeros_like, v)
    merged = torch_import.merge_pretrained(fresh, params, stats)
    _assert_tree_equal(merged["params"], v["params"])
    _assert_tree_equal(merged["batch_stats"], v["batch_stats"])


@pytest.mark.parametrize("head,backbone,ref_factory", [
    ("aspp", "panoptic_deeplab_50", "resnet_deeplab.resnet_50_deeplab"),
    ("pspp", "panoptic_pspnet_50", "resnet_pspnet.resnet_50_pspnet"),
])
def test_export_consumable_by_reference_model(head, backbone,
                                              ref_factory, monkeypatch):
    """The real guarantee: the reference's OWN torch model must load our
    exported state dict (no unexpected keys; only its fixed non-learned
    buffers missing) and produce the same embeddings."""
    torch = pytest.importorskip("torch")
    import os
    if not os.path.isdir("/root/reference/spml"):
        pytest.skip("reference checkout not available")
    from tests.test_model_parity import (_install_reference_path,
                                         _reference_config)
    _install_reference_path()
    import importlib

    from spml_tpu.models.embeddings import build_embedding_model

    # our model with random params and valid BN stats
    model = build_embedding_model(backbone, 32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 49, 3)),
                   train=False)
    rng = np.random.RandomState(7)
    v = dict(v)
    v["params"] = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32))
        * 0.1, v["params"])
    v["batch_stats"] = jax.tree.map(
        lambda x: jnp.asarray(
            (rng.rand(*x.shape).astype(np.float32) + 0.5)
            if x.shape else x), v["batch_stats"])

    sd = {k: torch.from_numpy(np.ascontiguousarray(val))
          for k, val in torch_export.export_embedding_model(v).items()}

    mod_name, fn_name = ref_factory.split(".")
    mod = importlib.import_module(f"spml.models.embeddings.{mod_name}")
    tm = getattr(mod, fn_name)(_reference_config())
    # the reference overrides load_state_dict with its warn-and-skip
    # remapper (base_model.py:26-52); use the vanilla nn.Module loader
    # to get strict missing/unexpected accounting
    missing, unexpected = torch.nn.Module.load_state_dict(
        tm, sd, strict=False)
    assert not unexpected, unexpected
    # only the LFN's fixed Gaussian smoothing buffers may be missing
    assert all(k.startswith("lfn.") for k in missing), missing
    tm.eval()

    xin = np.random.RandomState(1).randn(1, 33, 49, 3).astype(np.float32)
    with torch.no_grad():
        t_emb = tm.generate_embeddings(
            {"image": torch.tensor(xin.transpose(0, 3, 1, 2))}
        )["embedding"].numpy().transpose(0, 2, 3, 1)
    j_emb = np.asarray(model.apply(v, jnp.asarray(xin), train=False)[0])
    scale = np.abs(t_emb).max() + 1e-9
    np.testing.assert_allclose(j_emb / scale, t_emb / scale, atol=2e-4)


def test_pth_file_roundtrip(tmp_path):
    """save_torch_checkpoint -> load_torch_checkpoint, through torch."""
    pytest.importorskip("torch")
    emb = _emb_vars("aspp", seed=3)
    cls = _randomize(
        ClassifierHead(num_classes=4, hidden_dim=16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)), train=False),
        seed=4)
    params = {"embedding": emb["params"], "prediction": cls["params"]}
    stats = {"embedding": emb["batch_stats"],
             "prediction": cls["batch_stats"]}
    path = str(tmp_path / "model-99.pth")
    torch_export.save_torch_checkpoint(path, params, stats)

    p, s = torch_import.load_torch_checkpoint(path, key="embedding_model")
    fresh = jax.tree.map(jnp.zeros_like, emb)
    merged = torch_import.merge_pretrained(fresh, p, s)
    _assert_tree_equal(merged["params"], emb["params"])
    _assert_tree_equal(merged["batch_stats"], emb["batch_stats"])


def test_export_cli_restores_orbax_snapshot(tmp_path):
    """The CLI glue (pyscripts/misc/export_torch_checkpoint.py): a
    checkpoint.save'd TrainState must restore through the script's
    template-free mgr.restore path and export to a loadable .pth — an
    orbax raw-restore structure change would break this first."""
    torch = pytest.importorskip("torch")
    import runpy
    import sys

    from spml_tpu.config import load_config
    from spml_tpu.train import step as step_lib
    from spml_tpu.utils import checkpoint

    cfg = load_config(overrides={
        "network": {"backbone_types": "panoptic_deeplab_10",
                    "embedding_dim": 8, "kmeans_num_clusters": [2, 2],
                    "kmeans_iterations": 2},
        "dataset": {"num_classes": 4},
        "train": {"batch_size": 1, "crop_size": [16, 16],
                  "memory_bank_size": 1},
        "tpu": {"segment_capacity": 16, "compute_dtype": "float32"},
    })
    state = step_lib.init_state(cfg, jax.random.PRNGKey(0),
                                jnp.zeros((1, 16, 16, 3)))
    snap = tmp_path / "snap"
    checkpoint.save(str(snap / "checkpoints"), 7, state)

    out = tmp_path / "model-7.pth"
    argv = sys.argv
    sys.argv = ["export_torch_checkpoint.py",
                "--snapshot_dir", str(snap), "--out", str(out)]
    try:
        runpy.run_path("pyscripts/misc/export_torch_checkpoint.py",
                       run_name="__main__")
    finally:
        sys.argv = argv

    sd = torch.load(str(out), map_location="cpu", weights_only=False)
    assert set(sd) == {"embedding_model", "prediction_model"}
    # the exported embedding weights round-trip through the importer
    params, stats = torch_import.convert_state_dict(sd["embedding_model"])
    merged = torch_import.merge_pretrained(
        jax.tree.map(jnp.zeros_like,
                     {"params": state.params["embedding"],
                      "batch_stats": state.batch_stats["embedding"]}),
        params, stats)
    _assert_tree_equal(merged["params"],
                       jax.device_get(state.params["embedding"]))


def test_checkpoint_resave_same_step_overwrites(tmp_path):
    """Reference torch.save semantics: re-saving the same step REPLACES
    the checkpoint (orbax would otherwise skip silently and a rerun
    into the same snapshot dir would keep serving stale weights)."""
    from spml_tpu.utils import checkpoint

    d = str(tmp_path / "ck")
    a = {"params": {"w": jnp.full((4,), 1.0)}}
    b = {"params": {"w": jnp.full((4,), 2.0)}}
    checkpoint.save(d, 7, a)
    checkpoint.save(d, 7, b)
    got = checkpoint.restore(d, jax.tree.map(jnp.zeros_like, a))
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.full((4,), 2.0))
