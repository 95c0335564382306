"""bf16 compute path: bounded drift vs f32 with identical parameters."""
from dataclasses import replace

import numpy as np

import jax
import jax.numpy as jnp

from rvt_tpu.config import preset
from rvt_tpu.models import RVTDetector, init_detector, zero_states


def test_bf16_drift_bounded():
    cfg = preset("gen1", "tiny", resolution_hw=(64, 96))
    model_f32, variables = init_detector(cfg.model, jax.random.PRNGKey(0))
    model_bf16 = RVTDetector(cfg=replace(cfg.model, compute_dtype="bfloat16"))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 8, size=(1, 64, 96, 20)), jnp.float32)
    states = zero_states(cfg.model.backbone, 1)

    p32, _ = model_f32.apply(variables, x, states)
    p16, s16 = model_bf16.apply(variables, x, states)

    assert p16.dtype == jnp.float32  # decode upcasts
    assert s16[0][0].dtype == jnp.float32  # LSTM state math stays f32
    p32, p16 = np.asarray(p32), np.asarray(p16)
    # decoded box coordinates: sub-pixel agreement
    assert np.abs(p32[..., :2] - p16[..., :2]).max() < 1.5
    # score logits: small drift
    assert np.abs(p32[..., 4:] - p16[..., 4:]).max() < 0.3
    # probabilities very close
    pr32 = jax.nn.sigmoid(p32[..., 4:])
    pr16 = jax.nn.sigmoid(p16[..., 4:])
    assert np.abs(pr32 - pr16).max() < 0.05


def test_stem_s2d_equivalence():
    """stem_s2d model == standard model on the same weights + inputs."""
    import numpy as np

    from rvt_tpu.ops.s2d import host_space_to_depth

    cfg = preset("gen1", "tiny", resolution_hw=(64, 96))
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0))
    cfg_s2d = replace(cfg.model, backbone=replace(cfg.model.backbone,
                                                  stem_s2d=True))
    model_s2d = RVTDetector(cfg=cfg_s2d)

    rng = np.random.RandomState(0)
    x = rng.randint(0, 8, size=(2, 64, 96, 20)).astype(np.float32)
    states = zero_states(cfg.model.backbone, 2)
    p_ref, _ = model.apply(variables, jnp.asarray(x), states)
    xs = jnp.asarray(host_space_to_depth(x, cfg.model.backbone.in_res_hw))
    p_s2d, _ = model_s2d.apply(variables, xs, states)
    np.testing.assert_allclose(np.asarray(p_s2d), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-4)
