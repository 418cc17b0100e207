"""Convert torch SPML checkpoints into spml_tpu flax variables.

Handles two torch naming schemes:
* the reference module tree (resnet_backbone.conv1.conv1.0.weight, ...)
  as saved by pyscripts/train/train.py:298-302;
* the CUHK torchvision-style pretrained file (conv1.*, bn1.*, layer1..4)
  via the same renaming the reference applies in
  resnet_deeplab.py:222-232 (name_mapping).

Torch conv weights are OIHW -> flax HWIO; BN weight/bias ->
scale/bias (params) and running_mean/var -> mean/var (batch_stats).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def apply_reference_name_mapping(name: str) -> str:
    """CUHK torchvision naming -> reference module naming
    (resnet_deeplab.py:222-232)."""
    if name.startswith("module."):
        name = name[len("module."):]
    if name.startswith("conv1") or name.startswith("bn1"):
        return "resnet_backbone.conv1." + name
    return (name.replace("layer1", "resnet_backbone.res2")
                .replace("layer2", "resnet_backbone.res3")
                .replace("layer3", "resnet_backbone.res4")
                .replace("layer4", "resnet_backbone.res5"))


_STEM_CONV = {"0": "conv1_1", "3": "conv1_2", "6": "conv1_3"}
_STEM_BN = {"1": "conv1_1", "4": "conv1_2"}


def _flax_path(name: str) -> tuple[tuple[str, ...], str] | None:
    """Reference param name -> (flax module path, leaf kind).

    leaf kind in {kernel, bias, scale, mean, var}; returns None for
    entries to skip (num_batches_tracked, lfn smoothing kernel).
    """
    parts = name.split(".")
    leaf = parts[-1]
    kind = {"weight": "w", "bias": "b", "running_mean": "mean",
            "running_var": "var"}.get(leaf)
    if kind is None:
        return None

    if parts[0] == "lfn":
        return None  # fixed Gaussian kernel, not a parameter here

    if parts[0] == "resnet_backbone":
        sub = parts[1]
        if sub == "conv1":
            # stem: conv1.conv1.{idx} convs/bns + conv1.bn1
            if parts[2] == "conv1":
                idx = parts[3]
                if idx in _STEM_CONV and kind == "w":
                    return (("resnet_backbone", "stem", _STEM_CONV[idx],
                             "conv"), "kernel")
                if idx in _STEM_BN:
                    return (("resnet_backbone", "stem", _STEM_BN[idx],
                             "bn"), kind)
                return None
            if parts[2] == "bn1":
                return (("resnet_backbone", "stem", "conv1_3", "bn"), kind)
            return None
        if sub in ("res2", "res3", "res4", "res5"):
            block = f"block{parts[2]}"
            layer = parts[3]
            if layer.startswith("conv") and kind == "w":
                return (("resnet_backbone", sub, block, layer, "conv"),
                        "kernel")
            if layer.startswith("bn"):
                conv = "conv" + layer[-1]
                return (("resnet_backbone", sub, block, conv, "bn"), kind)
            if layer == "downsample":
                if parts[4] == "0" and kind == "w":
                    return (("resnet_backbone", sub, block, "downsample",
                             "conv"), "kernel")
                if parts[4] == "1":
                    return (("resnet_backbone", sub, block, "downsample",
                             "bn"), kind)
            return None

    if parts[0] == "aspp":
        # aspp.aspp_{i}.0.{weight,bias}
        m = re.match(r"aspp_(\d)", parts[1])
        if m:
            return (("aspp", f"aspp_{m.group(1)}"),
                    "kernel" if kind == "w" else "bias")
        return None

    if parts[0] == "pspp":
        if parts[1] == "0":  # the PSPP module
            if parts[2].startswith("pspp_"):
                idx = {"1": "conv", "2": "bn"}[parts[3]]
                mod = f"{parts[2]}_{idx}"
                if idx == "conv":
                    return (("pspp", mod), "kernel")
                return (("pspp", mod), kind)
            if parts[2] == "conv":
                idx = {"0": "fuse_conv", "1": "fuse_bn"}[parts[3]]
                if idx == "fuse_conv":
                    return (("pspp", idx), "kernel")
                return (("pspp", idx), kind)
            return None
        if parts[1] == "1":  # trailing 1x1 projection
            return (("pspp_proj",), "kernel" if kind == "w" else "bias")
        return None

    if parts[0] == "semantic_classifier":
        idx = parts[1]
        if idx == "0" and kind == "w":
            return (("conv1",), "kernel")
        if idx == "1":
            return (("bn",), kind)
        if idx == "4":
            return (("conv2",), "kernel" if kind == "w" else "bias")
        return None

    return None


def convert_state_dict(state_dict: dict[str, Any],
                       cuhk_names: bool = False):
    """torch state dict (tensors or ndarrays) -> (params, batch_stats)
    nested dicts suitable for flax apply."""
    params: dict = {}
    batch_stats: dict = {}
    for name, value in state_dict.items():
        if cuhk_names:
            name = apply_reference_name_mapping(name)
        out = _flax_path(name)
        if out is None:
            continue
        path, kind = out
        arr = np.asarray(value.detach().cpu().numpy()
                         if hasattr(value, "detach") else value)
        if kind == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            _set(params, path + ("kernel",), arr)
        elif kind == "bias":
            _set(params, path + ("bias",), arr)
        elif kind == "w":  # BN weight
            _set(params, path + ("scale",), arr)
        elif kind == "b":
            _set(params, path + ("bias",), arr)
        elif kind == "mean":
            _set(batch_stats, path + ("mean",), arr)
        elif kind == "var":
            _set(batch_stats, path + ("var",), arr)
    return params, batch_stats


def load_torch_checkpoint(path: str, key: str | None = None,
                          cuhk_names: bool = False):
    """Load a .pth file (torch required) and convert.

    `key` selects a sub-dict (e.g. 'embedding_model') for files saved by
    the reference train scripts.
    """
    import torch  # local import: torch is only needed for conversion
    sd = torch.load(path, map_location="cpu")
    if key is not None and key in sd:
        sd = sd[key]
    return convert_state_dict(sd, cuhk_names=cuhk_names)


def merge_pretrained(variables: dict, params: dict, batch_stats: dict,
                     strict_shapes: bool = True, strict_names: bool = True):
    """Overlay converted arrays onto an initialized variables pytree.

    Shape mismatches raise (or skip with strict_shapes=False, mirroring
    the reference's warn-and-skip at base_model.py:26-52). Converted
    entries that have no destination raise under strict_names — silent
    drops here mean silently-random weights downstream.
    """
    import jax

    unmatched: list[str] = []

    def overlay(dst, src, scope):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                unmatched.append("/".join(scope + (k,)))
                continue
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, scope + (k,))
            else:
                if dst[k].shape != v.shape:
                    if strict_shapes:
                        raise ValueError(
                            f"shape mismatch at {'/'.join(scope + (k,))}: "
                            f"{dst[k].shape} vs {v.shape}")
                    continue
                out[k] = jax.numpy.asarray(v, dst[k].dtype)
        return out

    new_vars = dict(variables)
    new_vars["params"] = overlay(variables["params"], params, ())
    if batch_stats:
        new_vars["batch_stats"] = overlay(
            variables.get("batch_stats", {}), batch_stats, ())
    if unmatched and strict_names:
        raise ValueError(f"unmatched converted entries: {unmatched[:10]}"
                         f"{'...' if len(unmatched) > 10 else ''}")
    return new_vars
