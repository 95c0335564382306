"""Golden parity tests: our jax model vs the reference torch model (CPU)
with identical converted weights.

This is the fidelity gate of SURVEY.md §7 step 3: per-module and end-to-end
activation parity on random inputs. The reference checkpoints themselves are
not downloadable in this environment, so parity against a randomly
initialised reference model (including randomised BN running stats) is the
strongest available equivalence check of the architecture + converter.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rvt_tpu.config import preset  # noqa: E402
from rvt_tpu.convert.torch_ckpt import assert_tree_match, convert_state_dict  # noqa: E402
from rvt_tpu.models import RVTDetector, init_detector, zero_states  # noqa: E402

from .reference_shim import build_reference_detector  # noqa: E402


def _small_cfg(size="tiny"):
    # Reduced 64x96 resolution (partition (2,3)): exercises every layer and
    # the window/grid partition logic while keeping XLA:CPU compiles cheap
    # on this 1-core machine. Full-resolution parity runs in
    # test_full_resolution_parity (marked slow).
    return preset("gen1", size, resolution_hw=(64, 96))


@pytest.fixture(scope="module")
def models_tiny():
    cfg = _small_cfg("tiny")
    ref = build_reference_detector(cfg, seed=0)
    variables = convert_state_dict(ref.state_dict())
    model, init_vars = init_detector(cfg.model, jax.random.PRNGKey(0), batch_size=1)
    assert_tree_match(variables["params"], init_vars["params"])
    if "batch_stats" in init_vars:
        assert_tree_match(variables["batch_stats"], init_vars["batch_stats"])
    return cfg, ref, model, variables


def _rand_input(cfg, batch=2, seed=3):
    rng = np.random.RandomState(seed)
    H, W = cfg.model.backbone.in_res_hw
    # event tensors are uint8 counts; use small ints as floats
    x = rng.randint(0, 8, size=(batch, 20, H, W)).astype(np.float32)
    return x


def test_backbone_parity(models_tiny):
    cfg, ref, model, variables = models_tiny
    x = _rand_input(cfg)
    with torch.no_grad():
        feats_t, states_t = ref.backbone(torch.from_numpy(x))

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    states0 = zero_states(cfg.model.backbone, x.shape[0])
    feats_j, states_j = model.apply(variables, x_j, states0, None, True,
                                    method=RVTDetector.forward_backbone)

    for stage in (1, 2, 3, 4):
        ours = np.asarray(feats_j[stage]).transpose(0, 3, 1, 2)
        theirs = feats_t[stage].numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5,
                                   err_msg=f"stage {stage} features")
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(states_j[i][1]).transpose(0, 3, 1, 2),
            states_t[i][1].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"stage {i} cell state")


def test_backbone_recurrence_parity(models_tiny):
    """Two consecutive steps: state carry must match."""
    cfg, ref, model, variables = models_tiny
    x1, x2 = _rand_input(cfg, seed=4), _rand_input(cfg, seed=5)
    with torch.no_grad():
        _, st = ref.backbone(torch.from_numpy(x1))
        feats_t, _ = ref.backbone(torch.from_numpy(x2), st)

    states = zero_states(cfg.model.backbone, x1.shape[0])
    for x in (x1, x2):
        x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
        feats_j, states = model.apply(variables, x_j, states, None, True,
                                      method=RVTDetector.forward_backbone)
    np.testing.assert_allclose(
        np.asarray(feats_j[4]).transpose(0, 3, 1, 2), feats_t[4].numpy(),
        rtol=1e-4, atol=1e-5)


def test_full_detector_parity(models_tiny):
    """End-to-end eval forward: decoded boxes + sigmoided scores."""
    cfg, ref, model, variables = models_tiny
    x = _rand_input(cfg)
    with torch.no_grad():
        preds_t, losses_t, _ = ref(torch.from_numpy(x))
    assert losses_t is None

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    states0 = zero_states(cfg.model.backbone, x.shape[0])
    preds_j, _ = model.apply(variables, x_j, states0)
    # ours: decoded boxes + logits -> apply sigmoid for comparison
    preds_j = np.concatenate([
        np.asarray(preds_j[..., :4]),
        jax.nn.sigmoid(preds_j[..., 4:]),
    ], axis=-1)

    np.testing.assert_allclose(preds_j[..., :4], preds_t[..., :4].numpy(),
                               rtol=1e-3, atol=1e-3, err_msg="boxes")
    np.testing.assert_allclose(preds_j[..., 4:], preds_t[..., 4:].numpy(),
                               rtol=1e-3, atol=1e-5, err_msg="scores")


@pytest.mark.slow
def test_full_resolution_parity():
    """End-to-end parity at the shipped gen1 resolution (256x320)."""
    cfg = preset("gen1", "tiny")
    ref = build_reference_detector(cfg, seed=0)
    variables = convert_state_dict(ref.state_dict())
    model = RVTDetector(cfg=cfg.model)
    x = _rand_input(cfg, batch=1)
    with torch.no_grad():
        preds_t, _, _ = ref(torch.from_numpy(x))
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    states0 = zero_states(cfg.model.backbone, 1)
    preds_j, _ = model.apply(variables, x_j, states0)
    preds_j = np.concatenate([np.asarray(preds_j[..., :4]),
                              jax.nn.sigmoid(preds_j[..., 4:])], axis=-1)
    np.testing.assert_allclose(preds_j[..., :4], preds_t[..., :4].numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(preds_j[..., 4:], preds_t[..., 4:].numpy(),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("size", ["small", "base"])
def test_conversion_all_sizes(size):
    """Converter covers every key for every model size (incl. gated MLP off,
    dim_head 24 for small, deeper CSP for base)."""
    cfg = _small_cfg(size)
    ref = build_reference_detector(cfg, seed=1)
    variables = convert_state_dict(ref.state_dict())
    _, init_vars = init_detector(cfg.model, jax.random.PRNGKey(0), batch_size=1)
    assert_tree_match(variables["params"], init_vars["params"])


def test_gen4_geometry_parity():
    """gen4-style config (partition_split 2, 3 classes) at reduced
    resolution: full forward parity vs the reference torch model."""
    cfg = preset("gen4", "tiny", resolution_hw=(128, 192))
    assert cfg.model.backbone.partition_split_32 == 2
    assert cfg.model.head.num_classes == 3
    ref = build_reference_detector(cfg, seed=2)
    variables = convert_state_dict(ref.state_dict())
    model = RVTDetector(cfg=cfg.model)

    rng = np.random.RandomState(7)
    H, W = cfg.model.backbone.in_res_hw
    x = rng.randint(0, 8, size=(1, 20, H, W)).astype(np.float32)
    with torch.no_grad():
        preds_t, _, _ = ref(torch.from_numpy(x))
    states0 = zero_states(cfg.model.backbone, 1)
    preds_j, _ = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                             states0)
    preds_j = np.concatenate([np.asarray(preds_j[..., :4]),
                              jax.nn.sigmoid(preds_j[..., 4:])], axis=-1)
    np.testing.assert_allclose(preds_j[..., :4], preds_t[..., :4].numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(preds_j[..., 4:], preds_t[..., 4:].numpy(),
                               rtol=1e-3, atol=1e-5)
