"""Misc coverage: converter error paths, class-agnostic NMS, registry."""
import numpy as np
import pytest

import jax.numpy as jnp

from rvt_tpu.convert.torch_ckpt import convert_state_dict
from rvt_tpu.ops.boxes import postprocess


def test_converter_rejects_unknown_keys():
    with pytest.raises(KeyError, match="unhandled"):
        convert_state_dict({"mdl.backbone.bogus.weight": np.zeros((2, 2))})


def test_converter_accepts_raw_and_prefixed():
    w = np.zeros((64, 20, 7, 7), np.float32)
    for key in ("backbone.stages.0.downsample_cf2cl.conv.weight",
                "mdl.backbone.stages.0.downsample_cf2cl.conv.weight"):
        out = convert_state_dict({key: w})
        k = out["params"]["backbone"]["stage1"]["downsample"]["conv"]["kernel"]
        assert k.shape == (7, 7, 20, 64)


def test_class_agnostic_nms():
    # two overlapping boxes of different classes: class-aware keeps both,
    # class-agnostic suppresses the weaker one
    preds = np.zeros((1, 2, 7), np.float32)
    preds[0, 0] = [50, 50, 40, 40, 0.9, 0.9, 0.1]
    preds[0, 1] = [52, 51, 40, 40, 0.8, 0.1, 0.8]
    kw = dict(conf_thre=0.05, nms_thre=0.45, pre_nms_topk=2, max_detections=2)
    _, valid_aware = postprocess(jnp.asarray(preds), 2, class_agnostic=False, **kw)
    _, valid_agn = postprocess(jnp.asarray(preds), 2, class_agnostic=True, **kw)
    assert int(valid_aware.sum()) == 2
    assert int(valid_agn.sum()) == 1
