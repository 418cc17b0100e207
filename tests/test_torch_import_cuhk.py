"""The CUHK (torchvision-style) pretrained-import path: every real
training run starts by loading resnet-101-cuhk.pth through
torch_import.load_torch_checkpoint(..., cuhk_names=True)
(train/driver.py:44-45). Reference mapping: resnet_deeplab.py:222-232.

Strategy: take the reference torch model's state dict, rename its
backbone entries to the CUHK naming (the inverse of name_mapping), and
assert the cuhk_names=True conversion reproduces the direct conversion
exactly and covers every backbone leaf of a freshly-initialized flax
model.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "spml")):
    pytest.skip("reference checkout not available", allow_module_level=True)


class _edict(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _install_reference_path():
    if "easydict" not in sys.modules:
        mod = types.ModuleType("easydict")
        mod.EasyDict = _edict
        sys.modules["easydict"] = mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _to_cuhk_name(name):
    """Invert resnet_deeplab.py:222-232 name_mapping for backbone keys."""
    if name.startswith("resnet_backbone.conv1."):
        return name[len("resnet_backbone.conv1."):]  # conv1.* / bn1.*
    return (name.replace("resnet_backbone.res2", "layer1")
                .replace("resnet_backbone.res3", "layer2")
                .replace("resnet_backbone.res4", "layer3")
                .replace("resnet_backbone.res5", "layer4"))


@pytest.fixture(scope="module")
def cuhk_world():
    _install_reference_path()
    from spml.models.embeddings.resnet_deeplab import resnet_50_deeplab

    cfg = _edict(
        network=_edict(embedding_dim=32, label_divisor=255,
                       kmeans_num_clusters=[6, 6], kmeans_iterations=10),
        dataset=_edict(num_classes=21, semantic_ignore_index=255))
    tm = resnet_50_deeplab(cfg)
    g = torch.Generator().manual_seed(0)
    sd = tm.state_dict()
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    backbone_sd = {k: v for k, v in sd.items()
                   if k.startswith("resnet_backbone.")}
    cuhk_sd = {_to_cuhk_name(k): v for k, v in backbone_sd.items()}
    # sanity on the synthetic naming itself
    assert "conv1.0.weight" in cuhk_sd
    assert "bn1.weight" in cuhk_sd
    assert "layer1.0.downsample.0.weight" in cuhk_sd
    return backbone_sd, cuhk_sd


def test_cuhk_conversion_equals_direct(cuhk_world):
    from spml_tpu.utils import torch_import

    backbone_sd, cuhk_sd = cuhk_world
    p_direct, s_direct = torch_import.convert_state_dict(backbone_sd)
    p_cuhk, s_cuhk = torch_import.convert_state_dict(cuhk_sd,
                                                     cuhk_names=True)
    import jax

    def leaves(tree):
        return {tuple(getattr(k, "key", str(k)) for k in kp): v
                for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    for direct, cuhk in ((p_direct, p_cuhk), (s_direct, s_cuhk)):
        d, c = leaves(direct), leaves(cuhk)
        assert set(d) == set(c)
        for k in d:
            np.testing.assert_array_equal(d[k], c[k])


def test_cuhk_import_covers_every_backbone_param(cuhk_world, tmp_path):
    """Round-trip through a .pth file + merge_pretrained into an
    initialized flax model: every resnet_backbone leaf must change."""
    import jax
    import jax.numpy as jnp

    from spml_tpu.models.embeddings import build_embedding_model
    from spml_tpu.utils import torch_import

    _, cuhk_sd = cuhk_world
    pth = tmp_path / "resnet-50-cuhk.pth"
    torch.save(cuhk_sd, str(pth))

    # the driver path: key='embedding_model' is absent in the raw CUHK
    # file and must fall through to the whole dict
    params, stats = torch_import.load_torch_checkpoint(
        str(pth), key="embedding_model", cuhk_names=True)

    jm = build_embedding_model("panoptic_deeplab_50", 32)
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 33, 49, 3)), train=False)
    merged = torch_import.merge_pretrained(
        variables, params, stats, strict_shapes=True, strict_names=True)

    def leaves(tree):
        return {tuple(getattr(k, "key", str(k)) for k in kp): v
                for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    # every flax backbone leaf must be covered by a converted entry, and
    # the merged value must equal the converted source value exactly
    src_params = leaves(params["resnet_backbone"])
    got_params = leaves(merged["params"]["resnet_backbone"])
    assert set(src_params) == set(got_params) and len(got_params) > 50, \
        (f"uncovered backbone params: "
         f"{sorted(set(got_params) - set(src_params))[:5]}")
    for k in got_params:
        np.testing.assert_array_equal(np.asarray(got_params[k]),
                                      src_params[k], err_msg=str(k))
    src_stats = leaves(stats["resnet_backbone"])
    got_stats = leaves(merged["batch_stats"]["resnet_backbone"])
    assert set(src_stats) == set(got_stats)
    for k in got_stats:
        np.testing.assert_array_equal(np.asarray(got_stats[k]),
                                      src_stats[k], err_msg=str(k))
