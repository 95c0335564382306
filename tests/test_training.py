"""Training-step integration tests on tiny shapes: loss finite, states
propagate, LR schedule, loss decreases when overfitting one batch."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.config import preset
from rvt_tpu.models import RVTDetector
from rvt_tpu.models.backbone import zero_states
from rvt_tpu.training import (init_train_state, make_optimizer,
                              make_train_step, onecycle_schedule)


def _tiny_cfg():
    return preset("gen1", "tiny", resolution_hw=(32, 32), sequence_length=2,
                  max_labels_per_frame=4, max_labeled_frames=2)


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = RVTDetector(cfg=cfg.model)
    optimizer = make_optimizer(cfg.training)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, optimizer, donate=False)
    return cfg, model, optimizer, state, step


def _batch(cfg, B=2, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    M = cfg.dataset.max_labels_per_frame
    ev = rng.randint(0, 4, size=(B, T, H, W, 20)).astype(np.uint8)
    labels = np.zeros((B, T, M, 7), np.float32)
    label_mask = np.zeros((B, T, M), bool)
    labels[:, -1, 0] = (0, 8.0, 8.0, 12.0, 12.0, 1.0, 1.0)
    label_mask[:, -1, 0] = True
    return (jnp.asarray(ev), jnp.asarray(labels), jnp.asarray(label_mask),
            jnp.asarray(label_mask.any(-1)))


def test_train_step_runs_and_updates(setup):
    cfg, model, optimizer, state, step = setup
    B = 2
    ev, labels, mask, fv = _batch(cfg, B)
    states = zero_states(cfg.model.backbone, B)
    is_first = jnp.ones((B,), bool)

    new_state, new_states, metrics = step(state, states, ev, labels, mask,
                                          fv, is_first)
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert int(new_state.step) == 1
    # params actually changed
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(delta)) > 0
    # lstm states propagate (non-zero h after a window)
    h_sum = float(jnp.abs(new_states[0][0]).sum())
    assert h_sum > 0


def test_overfit_single_batch():
    """Loss must drop substantially when repeating one batch (end-to-end
    learning signal through scan + SimOTA + AdamW). Uses a constant LR —
    the production OneCycle schedule is still ~max_lr/20 at step 12."""
    import optax

    cfg = _tiny_cfg()
    model = RVTDetector(cfg=cfg.model)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, optimizer, donate=False)
    B = 2
    ev, labels, mask, fv = _batch(cfg, B, seed=1)
    zero = zero_states(cfg.model.backbone, B)
    is_first = jnp.ones((B,), bool)

    losses = []
    for i in range(12):
        state, _, metrics = step(state, zero, ev, labels, mask, fv, is_first)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


def test_onecycle_schedule_shape():
    cfg = _tiny_cfg().training
    sched = onecycle_schedule(cfg)
    s = cfg.lr_scheduler
    warmup = int(s.pct_start * s.total_steps)
    lr0 = float(sched(0))
    lr_peak = float(sched(warmup))
    lr_end = float(sched(s.total_steps))
    np.testing.assert_allclose(lr0, cfg.learning_rate / s.div_factor, rtol=1e-3)
    np.testing.assert_allclose(lr_peak, cfg.learning_rate, rtol=1e-3)
    np.testing.assert_allclose(lr_end, cfg.learning_rate / s.final_div_factor,
                               rtol=1e-2)


def test_state_reset_mask(setup):
    cfg, model, optimizer, state, step = setup
    from rvt_tpu.training.step import reset_states

    B = 2
    states = tuple((jnp.ones((B, 4, 4, 8)), jnp.ones((B, 4, 4, 8)))
                   for _ in range(2))
    out = reset_states(states, jnp.asarray([True, False]))
    h = np.asarray(out[0][0])
    assert h[0].sum() == 0 and h[1].sum() > 0


def test_train_step_with_s2d_stem():
    """Gradients flow through the folded stem kernel (stem_s2d training)."""
    from dataclasses import replace

    import optax

    from rvt_tpu.ops.s2d import host_space_to_depth

    cfg = _tiny_cfg()
    cfg = replace(cfg, model=replace(
        cfg.model, backbone=replace(cfg.model.backbone, stem_s2d=True)))
    model = RVTDetector(cfg=cfg.model)
    optimizer = optax.adamw(1e-3)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, optimizer, donate=False)
    B = 2
    ev, labels, mask, fv = _batch(cfg, B)
    ev_s2d = jnp.asarray(host_space_to_depth(
        np.asarray(ev), cfg.model.backbone.in_res_hw))
    states = zero_states(cfg.model.backbone, B)
    new_state, _, metrics = step(state, states, ev_s2d, labels, mask, fv,
                                 jnp.ones((B,), bool))
    assert np.isfinite(float(metrics["loss"]))
    # the 7x7 stem kernel itself received a gradient update
    k0 = state.params["backbone"]["stage1"]["downsample"]["conv"]["kernel"]
    k1 = new_state.params["backbone"]["stage1"]["downsample"]["conv"]["kernel"]
    assert k0.shape[:2] == (7, 7)
    assert float(jnp.abs(k1 - k0).max()) > 0


def test_train_step_with_token_mask():
    """enable_masking training end-to-end: a token mask threads from the
    step args through scan_backbone to the stage-1 mask-token replacement
    (reference modules/detection.py:135-138). All-False mask == no mask;
    all-True mask changes the loss and routes a gradient to mask_token."""
    from dataclasses import replace

    import optax

    cfg = _tiny_cfg()
    cfg = replace(cfg, model=replace(
        cfg.model, backbone=replace(cfg.model.backbone, enable_masking=True)))
    model = RVTDetector(cfg=cfg.model)
    optimizer = optax.adamw(1e-3)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    assert "mask_token" in state.params["backbone"]["stage1"]
    step = make_train_step(model, cfg, optimizer, donate=False,
                           with_param_metrics=True)
    B = 2
    ev, labels, mask, fv = _batch(cfg, B)
    T = cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    p = cfg.model.backbone.stem_patch_size
    states = zero_states(cfg.model.backbone, B)
    is_first = jnp.ones((B,), bool)

    tm_false = jnp.zeros((B, T, H // p, W // p), bool)
    tm_true = jnp.ones((B, T, H // p, W // p), bool)

    _, _, m_none = step(state, states, ev, labels, mask, fv, is_first)
    _, _, m_false = step(state, states, ev, labels, mask, fv, is_first,
                         tm_false)
    s_true, _, m_true = step(state, states, ev, labels, mask, fv, is_first,
                             tm_true)
    # all-False mask is numerically the no-mask path
    np.testing.assert_allclose(float(m_false["loss"]), float(m_none["loss"]),
                               rtol=1e-6)
    # all-True mask replaces every stage-1 token -> different loss
    assert abs(float(m_true["loss"]) - float(m_none["loss"])) > 1e-6
    # and the mask token itself received a gradient update
    t0 = state.params["backbone"]["stage1"]["mask_token"]
    t1 = s_true.params["backbone"]["stage1"]["mask_token"]
    assert float(jnp.abs(t1 - t0).max()) > 0
    assert float(m_true["gradflow/backbone/stage1/mask_token"]) > 0
