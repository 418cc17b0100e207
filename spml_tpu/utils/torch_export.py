"""Convert spml_tpu flax variables into reference-named torch state dicts.

The inverse of spml_tpu/utils/torch_import.py: models trained here can
be exported to the exact naming the reference saves
(pyscripts/train/train.py:298-302 in twke18/SPML — modules
resnet_backbone.*, aspp.*/pspp.*, semantic_classifier.*), so the
reference's own inference/benchmark scripts (or any torch tooling built
on them) can consume checkpoints produced by this framework.

Conversions mirror the import exactly: flax HWIO conv kernels -> torch
OIHW; BN scale/bias -> weight/bias, batch_stats mean/var ->
running_mean/running_var (+ a zero num_batches_tracked so strict torch
load_state_dict passes). Round-trip (export -> torch_import) equality is
locked by tests/test_torch_export.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(value) -> np.ndarray:
    return np.asarray(value, dtype=np.float32)


def _conv(out: dict, name: str, leaves: dict) -> None:
    """Conv module: kernel (HWIO -> OIHW) + optional bias."""
    k = _np(leaves["kernel"])
    if k.ndim == 4:
        k = k.transpose(3, 2, 0, 1)
    out[f"{name}.weight"] = k
    if "bias" in leaves:
        out[f"{name}.bias"] = _np(leaves["bias"])


def _bn(out: dict, name: str, params: dict, stats: dict) -> None:
    out[f"{name}.weight"] = _np(params["scale"])
    out[f"{name}.bias"] = _np(params["bias"])
    out[f"{name}.running_mean"] = _np(stats["mean"])
    out[f"{name}.running_var"] = _np(stats["var"])
    out[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)


_STEM_CONV_IDX = {"conv1_1": "0", "conv1_2": "3", "conv1_3": "6"}
_STEM_BN_NAME = {"conv1_1": "conv1.1", "conv1_2": "conv1.4",
                 "conv1_3": "bn1"}


def _export_backbone(out: dict, params: dict, stats: dict) -> None:
    stem_p, stem_s = params["stem"], stats["stem"]
    for mod, idx in _STEM_CONV_IDX.items():
        _conv(out, f"resnet_backbone.conv1.conv1.{idx}",
              stem_p[mod]["conv"])
        _bn(out, f"resnet_backbone.conv1.{_STEM_BN_NAME[mod]}",
            stem_p[mod]["bn"], stem_s[mod]["bn"])
    for res in ("res2", "res3", "res4", "res5"):
        for block, bp in params[res].items():
            bs = stats[res][block]
            i = block[len("block"):]
            pre = f"resnet_backbone.{res}.{i}"
            for conv in ("conv1", "conv2", "conv3"):
                _conv(out, f"{pre}.{conv}", bp[conv]["conv"])
                _bn(out, f"{pre}.bn{conv[-1]}", bp[conv]["bn"],
                    bs[conv]["bn"])
            if "downsample" in bp:
                _conv(out, f"{pre}.downsample.0", bp["downsample"]["conv"])
                _bn(out, f"{pre}.downsample.1", bp["downsample"]["bn"],
                    bs["downsample"]["bn"])


def _export_head(out: dict, params: dict, stats: dict) -> None:
    if "aspp" in params:
        # reference: aspp.aspp_{i}.0.{weight,bias} (resnet_deeplab.py)
        for mod, leaves in params["aspp"].items():
            _conv(out, f"aspp.{mod}.0", leaves)
    if "pspp" in params:
        # reference: pspp.0.pspp_{i}.{1 conv,2 bn}, pspp.0.conv.{0,1},
        # pspp.1 projection (resnet_pspnet.py)
        pp, ps = params["pspp"], stats.get("pspp", {})
        for i in "1234":
            _conv(out, f"pspp.0.pspp_{i}.1", pp[f"pspp_{i}_conv"])
            _bn(out, f"pspp.0.pspp_{i}.2", pp[f"pspp_{i}_bn"],
                ps[f"pspp_{i}_bn"])
        _conv(out, "pspp.0.conv.0", pp["fuse_conv"])
        _bn(out, "pspp.0.conv.1", pp["fuse_bn"], ps["fuse_bn"])
    if "pspp_proj" in params:
        _conv(out, "pspp.1", params["pspp_proj"])


def export_embedding_model(variables: dict) -> dict[str, Any]:
    """Flax variables of an EmbeddingModel -> reference
    'embedding_model' torch-style state dict (numpy arrays)."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    out: dict[str, Any] = {}
    _export_backbone(out, params["resnet_backbone"],
                     stats["resnet_backbone"])
    _export_head(out, params, stats)
    return out


def export_classifier_head(variables: dict) -> dict[str, Any]:
    """Flax variables of a ClassifierHead -> reference
    'prediction_model' state dict (semantic_classifier.{0 conv,1 bn,
    4 conv} — segsort_softmax.py:22-37 / softmax_classifier.py)."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    out: dict[str, Any] = {}
    _conv(out, "semantic_classifier.0", params["conv1"])
    _bn(out, "semantic_classifier.1", params["bn"], stats["bn"])
    _conv(out, "semantic_classifier.4", params["conv2"])
    return out


def export_state(params: dict, batch_stats: dict) -> dict[str, dict]:
    """TrainState params/batch_stats ({'embedding','prediction'} trees)
    -> {'embedding_model', 'prediction_model'} reference state dicts."""
    emb = {"params": params["embedding"],
           "batch_stats": batch_stats["embedding"]}
    cls = {"params": params["prediction"],
           "batch_stats": batch_stats["prediction"]}
    return {"embedding_model": export_embedding_model(emb),
            "prediction_model": export_classifier_head(cls)}


def save_torch_checkpoint(path: str, params: dict,
                          batch_stats: dict) -> None:
    """Write a reference-format .pth (torch required)."""
    import torch
    sd = {mk: {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in d.items()}
          for mk, d in export_state(params, batch_stats).items()}
    torch.save(sd, path)
