"""Numerical forward parity of the flax models against the reference
torch implementation (loaded from /root/reference, torch CPU).

These tests exercise the whole conversion + architecture chain: conv
padding alignment, BN eval semantics, ASPP/PSPP structure, bilinear
upsampling, and the torch->flax checkpoint converter.
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


def _reference_config(dim=32):
    return _edict(
        network=_edict(embedding_dim=dim, label_divisor=255,
                       kmeans_num_clusters=[6, 6], kmeans_iterations=10),
        dataset=_edict(num_classes=21, semantic_ignore_index=255))


def _randomize_bn_stats(model, seed=0):
    sd = model.state_dict()
    g = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)


@pytest.mark.parametrize("backbone,ref_factory", [
    ("panoptic_deeplab_50", "resnet_deeplab.resnet_50_deeplab"),
    ("panoptic_pspnet_50", "resnet_pspnet.resnet_50_pspnet"),
])
def test_embedding_forward_parity(backbone, ref_factory):
    _install_reference_path()
    import importlib

    import jax
    import jax.numpy as jnp

    from spml_tpu.models.embeddings import build_embedding_model
    from spml_tpu.utils import torch_import

    mod_name, fn_name = ref_factory.split(".")
    mod = importlib.import_module(f"spml.models.embeddings.{mod_name}")
    tm = getattr(mod, fn_name)(_reference_config())
    tm.eval()
    _randomize_bn_stats(tm)

    params, stats = torch_import.convert_state_dict(tm.state_dict())
    jm = build_embedding_model(backbone, 32)
    x0 = jnp.zeros((1, 33, 49, 3))  # odd sizes stress padding alignment
    variables = jm.init(jax.random.PRNGKey(0), x0, train=False)
    variables = torch_import.merge_pretrained(variables, params, stats)

    xin = np.random.RandomState(1).randn(1, 33, 49, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tm.generate_embeddings(
            {"image": torch.tensor(xin.transpose(0, 3, 1, 2))})
    t_emb = t_out["embedding"].numpy().transpose(0, 2, 3, 1)
    t_loc = t_out["local_feature"].numpy()

    j_emb, j_loc = jm.apply(variables, jnp.asarray(xin), train=False)
    j_emb, j_loc = np.asarray(j_emb), np.asarray(j_loc)

    assert j_emb.shape == t_emb.shape
    scale = np.abs(t_emb).max() + 1e-9
    np.testing.assert_allclose(j_emb / scale, t_emb / scale, atol=2e-4)
    np.testing.assert_allclose(j_loc, t_loc, atol=1e-6)
