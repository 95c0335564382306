"""Import helpers for running the *reference* torch model inside tests.

The reference code (read-only at /root/reference) depends on omegaconf and
torchvision which are not installed; both are shimmed with minimal stand-ins
sufficient for module construction. This lets golden parity tests compare
our jax model against the reference torch model on CPU with identical
(converted) weights — the fidelity gate of SURVEY.md §7 step 3.
"""
from __future__ import annotations

import sys
import types
from typing import Any, Dict


class DictConfig(dict):
    """Attribute-access dict mimicking omegaconf.DictConfig."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def to_cfg(d: Any) -> Any:
    if isinstance(d, dict):
        return DictConfig({k: to_cfg(v) for k, v in d.items()})
    return d


def _to_container(cfg, resolve=True, throw_on_missing=True):
    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        return x
    return conv(cfg)


def install_shims() -> None:
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = DictConfig
        om.OmegaConf = types.SimpleNamespace(to_container=_to_container)
        sys.modules["omegaconf"] = om
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(nms=None, batched_nms=None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops  # type: ignore[assignment]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def reference_model_cfg(cfg) -> DictConfig:
    """Build the reference model DictConfig from our ExperimentConfig."""
    bb = cfg.model.backbone
    att = bb.attention
    return to_cfg({
        "backbone": {
            "name": "MaxViTRNN",
            "compile": None,
            "input_channels": bb.input_channels,
            "enable_masking": bb.enable_masking,
            "partition_split_32": bb.partition_split_32,
            "embed_dim": bb.embed_dim,
            "dim_multiplier": list(bb.dim_multiplier),
            "num_blocks": list(bb.num_blocks),
            "T_max_chrono_init": [4, 8, 16, 32],
            "in_res_hw": list(bb.in_res_hw),
            "stem": {"patch_size": bb.stem_patch_size},
            "stage": {
                "downsample": {
                    "type": "patch",
                    "overlap": bb.downsample.overlap,
                    "norm_affine": bb.downsample.norm_affine,
                },
                "attention": {
                    "use_torch_mha": False,
                    "partition_size": list(att.partition_size),
                    "dim_head": att.dim_head,
                    "attention_bias": att.attention_bias,
                    "mlp_activation": att.mlp_activation,
                    "mlp_gated": att.mlp_gated,
                    "mlp_bias": att.mlp_bias,
                    "mlp_ratio": att.mlp_ratio,
                    "drop_mlp": att.drop_mlp,
                    "drop_path": att.drop_path,
                    "ls_init_value": att.ls_init_value,
                },
                "lstm": {
                    "dws_conv": bb.lstm.dws_conv,
                    "dws_conv_only_hidden": bb.lstm.dws_conv_only_hidden,
                    "dws_conv_kernel_size": bb.lstm.dws_conv_kernel_size,
                    "drop_cell_update": bb.lstm.drop_cell_update,
                },
            },
        },
        "fpn": {
            "name": "PAFPN",
            "compile": None,
            "depth": cfg.model.fpn.depth,
            "in_stages": list(cfg.model.fpn.in_stages),
            "depthwise": cfg.model.fpn.depthwise,
            "act": cfg.model.fpn.act,
        },
        "head": {
            "name": "YoloX",
            "compile": None,
            "depthwise": cfg.model.head.depthwise,
            "act": cfg.model.head.act,
            "num_classes": cfg.model.head.num_classes,
        },
        "postprocess": {
            "confidence_threshold": cfg.model.postprocess.confidence_threshold,
            "nms_threshold": cfg.model.postprocess.nms_threshold,
        },
    })


def build_reference_detector(cfg, seed: int = 0):
    """Instantiate the reference torch YoloXDetector (random init) in eval
    mode with randomised BN running stats (to catch stat-mapping bugs)."""
    install_shims()
    import torch

    from models.detection.yolox_extension.models.detector import YoloXDetector  # noqa: E501

    torch.manual_seed(seed)
    model = YoloXDetector(reference_model_cfg(cfg))
    model.eval()
    # Randomise BN running stats so conversion errors cannot hide behind
    # the (0, 1) defaults.
    gen = torch.Generator().manual_seed(seed + 1)
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
            mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=gen) * 0.5 + 0.75)
    return model
