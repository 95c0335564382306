"""Convert reference PyTorch RVT checkpoints to rvt_tpu flax variables.

Handles both raw ``state_dict`` mappings and PyTorch-Lightning ``.ckpt``
files (where model weights live under ``state_dict`` with an ``mdl.``
prefix — see the reference ``modules/detection.py:33``).

Key-layout documentation (reference torch module tree -> our flax tree):

  backbone.stages.{i}.downsample_cf2cl.{conv,norm}   -> backbone/stage{i+1}/downsample/{conv,norm}
  backbone.stages.{i}.att_blocks.{j}.att_{window,grid}.(norm1|self_attn.qkv|
      self_attn.proj|ls1|norm2|mlp.net.*|ls2)        -> backbone/stage{i+1}/block{j}/att_{window,grid}/...
  backbone.stages.{i}.lstm.conv{3x3_dws,1x1}         -> backbone/stage{i+1}/lstm/...
  fpn.(lateral_conv0|C3_p4|reduce_conv1|C3_p3|bu_conv2|C3_n3|bu_conv1|C3_n4)
                                                     -> fpn/... (CSP members m.{k} -> m{k})
  yolox_head.stems.{k}                               -> head/stem{k}
  yolox_head.{cls,reg}_convs.{k}.{j}                 -> head/{cls,reg}_conv{k}_{j}
  yolox_head.{cls,reg,obj}_preds.{k}                 -> head/{cls,reg,obj}_pred{k}

Weight-layout transposes:
  conv   OIHW -> HWIO (also depthwise [C,1,k,k] -> [k,k,1,C])
  linear [out,in] -> [in,out]
  batchnorm weight/bias/running_mean/running_var -> scale/bias + batch_stats
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    assert path[-1] not in node, f"duplicate key {path}"
    node[path[-1]] = value


def _convert_attention_subkey(rest: str) -> Tuple[Tuple[str, ...], str]:
    """Translate the suffix of an att_window/att_grid module.

    Returns (path_suffix, kind) with kind in {linear, direct}.
    """
    m = re.match(r"norm(\d)\.(weight|bias)$", rest)
    if m:
        name = "scale" if m.group(2) == "weight" else "bias"
        return ((f"norm{m.group(1)}", name), "direct")
    m = re.match(r"self_attn\.(qkv|proj)\.(weight|bias)$", rest)
    if m:
        kind = "linear" if m.group(2) == "weight" else "direct"
        return (("self_attn", m.group(1), "kernel" if m.group(2) == "weight" else "bias"), kind)
    m = re.match(r"ls(\d)\.gamma$", rest)
    if m:
        return ((f"ls{m.group(1)}", "gamma"), "direct")
    # MLP: plain -> net.0.0 (fc1), net.2 (fc2); gated -> net.0.proj, net.2
    m = re.match(r"mlp\.net\.0\.0\.(weight|bias)$", rest)
    if m:
        kind = "linear" if m.group(1) == "weight" else "direct"
        return (("mlp", "fc1", "kernel" if m.group(1) == "weight" else "bias"), kind)
    m = re.match(r"mlp\.net\.0\.proj\.(weight|bias)$", rest)
    if m:
        kind = "linear" if m.group(1) == "weight" else "direct"
        return (("mlp", "glu", "proj", "kernel" if m.group(1) == "weight" else "bias"), kind)
    m = re.match(r"mlp\.net\.2\.(weight|bias)$", rest)
    if m:
        kind = "linear" if m.group(1) == "weight" else "direct"
        return (("mlp", "fc2", "kernel" if m.group(1) == "weight" else "bias"), kind)
    raise KeyError(rest)


def _convert_baseconv_subkey(rest: str) -> Tuple[Tuple[str, ...], str, str]:
    """BaseConv suffix 'conv.weight'/'bn.*' -> (path, kind, collection)."""
    if rest == "conv.weight":
        return (("conv", "kernel"), "conv", "params")
    m = re.match(r"bn\.(weight|bias|running_mean|running_var)$", rest)
    if m:
        name = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}[m.group(1)]
        coll = "params" if m.group(1) in ("weight", "bias") else "batch_stats"
        return (("bn", name), "direct", coll)
    if rest == "bn.num_batches_tracked":
        return ((), "skip", "")
    raise KeyError(rest)


_FPN_NAMES = ("lateral_conv0", "reduce_conv1", "bu_conv2", "bu_conv1",
              "C3_p4", "C3_p3", "C3_n3", "C3_n4")


def convert_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """torch state_dict (numpy-convertible values) -> flax variables dict
    with 'params' and 'batch_stats' collections."""
    params: Dict = {}
    batch_stats: Dict = {}

    def put(coll: str, path: Tuple[str, ...], val: np.ndarray):
        _set(params if coll == "params" else batch_stats, path, val)

    for key, value in state_dict.items():
        v = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if key.startswith("mdl."):
            key = key[len("mdl."):]

        # ---------------- backbone ----------------
        m = re.match(r"backbone\.stages\.(\d+)\.(.*)$", key)
        if m:
            stage = f"stage{int(m.group(1)) + 1}"
            rest = m.group(2)
            if rest == "mask_token":
                put("params", ("backbone", stage, "mask_token"), v)
                continue
            m2 = re.match(r"downsample_cf2cl\.conv\.weight$", rest)
            if m2:
                put("params", ("backbone", stage, "downsample", "conv", "kernel"), _t_conv(v))
                continue
            m2 = re.match(r"downsample_cf2cl\.norm\.(weight|bias)$", rest)
            if m2:
                name = "scale" if m2.group(1) == "weight" else "bias"
                put("params", ("backbone", stage, "downsample", "norm", name), v)
                continue
            m2 = re.match(r"att_blocks\.(\d+)\.(att_window|att_grid)\.(.*)$", rest)
            if m2:
                block = f"block{m2.group(1)}"
                suffix, kind = _convert_attention_subkey(m2.group(3))
                val = _t_linear(v) if kind == "linear" else v
                put("params", ("backbone", stage, block, m2.group(2)) + suffix, val)
                continue
            m2 = re.match(r"lstm\.(conv3x3_dws|conv1x1)\.(weight|bias)$", rest)
            if m2:
                name = "kernel" if m2.group(2) == "weight" else "bias"
                val = _t_conv(v) if m2.group(2) == "weight" else v
                put("params", ("backbone", stage, "lstm", m2.group(1), name), val)
                continue
            raise KeyError(key)

        # ---------------- fpn ----------------
        m = re.match(r"fpn\.([A-Za-z0-9_]+)\.(.*)$", key)
        if m and m.group(1) in _FPN_NAMES:
            name, rest = m.group(1), m.group(2)
            # CSP member path: m.{k}.conv{1,2}... -> m{k}/conv{1,2}
            rest = re.sub(r"^m\.(\d+)\.", lambda mo: f"m{mo.group(1)}.", rest)
            # DWConv members keep their names (dconv/pconv)
            parts = rest.split(".")
            sub_path = tuple(parts[:-2])
            suffix, kind, coll = _convert_baseconv_subkey(".".join(parts[-2:]))
            if kind == "skip":
                continue
            val = _t_conv(v) if kind == "conv" else v
            put(coll, ("fpn", name) + sub_path + suffix, val)
            continue

        # ---------------- head ----------------
        m = re.match(r"yolox_head\.stems\.(\d+)\.(.*)$", key)
        if m:
            suffix, kind, coll = _convert_baseconv_subkey(m.group(2))
            if kind == "skip":
                continue
            val = _t_conv(v) if kind == "conv" else v
            put(coll, ("head", f"stem{m.group(1)}") + suffix, val)
            continue
        m = re.match(r"yolox_head\.(cls|reg)_convs\.(\d+)\.(\d+)\.(.*)$", key)
        if m:
            prefix = ("head", f"{m.group(1)}_conv{m.group(2)}_{m.group(3)}")
            rest = m.group(4)
            # depthwise variant nests dconv/pconv BaseConvs
            parts = rest.split(".")
            sub_path = tuple(parts[:-2])
            suffix, kind, coll = _convert_baseconv_subkey(".".join(parts[-2:]))
            if kind == "skip":
                continue
            val = _t_conv(v) if kind == "conv" else v
            put(coll, prefix + sub_path + suffix, val)
            continue
        m = re.match(r"yolox_head\.(cls|reg|obj)_preds\.(\d+)\.(weight|bias)$", key)
        if m:
            name = "kernel" if m.group(3) == "weight" else "bias"
            val = _t_conv(v) if m.group(3) == "weight" else v
            put("params", ("head", f"{m.group(1)}_pred{m.group(2)}", name), val)
            continue

        if key.endswith("num_batches_tracked"):
            continue
        raise KeyError(f"unhandled reference checkpoint key: {key}")

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> Dict[str, Dict]:
    """Load a Lightning .ckpt / torch .pt file and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_state_dict(state_dict)


def assert_tree_match(converted: Dict, reference: Dict, path: str = "") -> None:
    """Recursively check that two variable trees have identical structure
    and leaf shapes (reference = freshly initialised flax variables)."""
    ck, rk = set(converted.keys()), set(reference.keys())
    assert ck == rk, f"at {path}: missing={rk - ck}, extra={ck - rk}"
    for k in ck:
        c, r = converted[k], reference[k]
        if isinstance(r, dict) or hasattr(r, "items"):
            assert_tree_match(c, dict(r), f"{path}/{k}")
        else:
            assert tuple(np.shape(c)) == tuple(np.shape(r)), \
                f"at {path}/{k}: {np.shape(c)} vs {np.shape(r)}"
