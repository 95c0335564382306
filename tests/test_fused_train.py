"""Gradient parity of the fused TRAIN kernels (ops/fused_train.py,
custom-VJP Pallas stage steps) against the XLA module path.

Geometries cover both kernel modes:
  * partitioned reshapes: (16, 10) maps with partition (8, 10)
  * masked-dense: tiny maps whose partition chunks Mosaic cannot
    lane-split (partition (2, 3))
Interpret mode on CPU; the lowered kernels are verified on the real chip
by tools/verify_tpu_kernels.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.config import AttentionConfig, DownsampleConfig, LstmConfig


def _stage_params(rng, C, key):
    """Init a stage param subtree via the XLA modules so both paths share
    weights."""
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair

    pair = MaxVitAttentionPair(dim=C, cfg=AttentionConfig(
        partition_size=rng["part"], dim_head=rng["dh"]),
        skip_first_norm=True, dtype=jnp.bfloat16, fused=False)
    cell = DWSConvLSTM2d(dim=C, cfg=LstmConfig(dws_conv=False),
                         dtype=jnp.bfloat16, fused=False)
    x = jnp.zeros((1, rng["H"], rng["W"], C), jnp.bfloat16)
    h = jnp.zeros((1, rng["H"], rng["W"], C), jnp.float32)
    pv = pair.init(jax.random.PRNGKey(key), x)
    cv = cell.init(jax.random.PRNGKey(key + 1), x, (h, h))
    return pair, cell, pv, cv


@pytest.mark.parametrize("H,W,C,part,dh", [
    (16, 10, 32, (8, 10), 32),   # partitioned mode
    (16, 24, 32, (2, 3), 32),    # masked-dense mode
])
def test_stage_step_grads_match_xla(H, W, C, part, dh):
    from rvt_tpu.ops.fused_train import (fused_stage_step_train,
                                         train_block_params,
                                         train_stage_mode)

    mode = train_stage_mode(H, W, C, part)
    assert mode == ("part" if part == (8, 10) else "dense")

    geo = dict(H=H, W=W, part=part, dh=dh)
    pair, cell, pv, cv = _stage_params(geo, C, key=0)
    rng = np.random.RandomState(0)
    B = 2
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    eps = 1e-5

    def xla_path(x, ds_s, ds_b, pv, cv, h0, c0):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
        xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
              * ds_s.astype(jnp.float32)
              + ds_b.astype(jnp.float32)).astype(jnp.bfloat16)
        y = pair.apply(pv, xn, False)
        return cell.apply(cv, y, (h0, c0), False)

    def fused_path(x, ds_s, ds_b, pv, cv, h0, c0):
        win = train_block_params(pv["params"]["att_window"], True)
        grd = train_block_params(pv["params"]["att_grid"], False)
        lp = cv["params"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
        cfg = (C // dh, dh, part, eps, eps, mode == "dense", True)
        return fused_stage_step_train(cfg, x, ds_s, ds_b, win, grd, lw,
                                      lb, h0, c0)

    # forward parity first
    (h_x, c_x) = xla_path(x, ds_s, ds_b, pv, cv, h0, c0)
    (h_f, c_f) = fused_path(x, ds_s, ds_b, pv, cv, h0, c0)
    scale = float(jnp.max(jnp.abs(h_x)))
    assert float(jnp.max(jnp.abs(h_f - h_x))) < 2e-2 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(c_f - c_x))) < 4e-2

    # gradient parity: scalar loss mixing both outputs
    wgt_h = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    wgt_c = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)

    def loss(fn, *args):
        h, c = fn(*args)
        return jnp.sum(h * wgt_h) + 0.5 * jnp.sum(jnp.tanh(c) * wgt_c)

    args = (x, ds_s, ds_b, pv, cv, h0, c0)
    g_x = jax.grad(lambda *a: loss(xla_path, *a), argnums=(0, 3, 4, 5, 6))(*args)
    g_f = jax.grad(lambda *a: loss(fused_path, *a), argnums=(0, 3, 4, 5, 6))(*args)

    flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
    assert tree_x == tree_f
    names = [str(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(g_x)[0]]
    for name, a, b in zip(names, flat_x, flat_f):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b).max() / s
        assert err < 6e-2, (name, err, s)


def test_fused_train_scan_backbone_matches_xla():
    """End-to-end: loss gradients of the full backbone scan (4 stages,
    downsample convs + fused train steps) vs the plain XLA remat path."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.detector import scan_backbone
    from rvt_tpu.parallel.mesh import make_mesh

    T, B = 3, 2
    cfg = preset("gen1", "tiny", resolution_hw=(64, 80), sequence_length=T,
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
    wgts = None

    def loss(params, model):
        feats, (st) = scan_backbone(
            model, {"params": params}, ev, states, deterministic=False,
            remat=True,
            # a 1-device mesh opts the fused model into the Pallas train
            # path on this 8-virtual-device CPU runtime (scan_backbone
            # falls back to XLA on multi-device runtimes without a mesh)
            mesh=make_mesh(1) if model is model_fused else None)
        total = 0.0
        nonlocal wgts
        if wgts is None:
            wgts = [jnp.asarray(np.random.RandomState(7).randn(*f.shape),
                                jnp.float32) for f in feats]
        for f, w in zip(feats, wgts):
            total = total + jnp.sum(f.astype(jnp.float32) * w)
        return total / ev.size

    params = variables["params"]
    g_x = jax.grad(lambda p: loss(p, model_ref))(params)
    g_f = jax.grad(lambda p: loss(p, model_fused))(params)
    leaves_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    leaves_f = jax.tree_util.tree_flatten(g_f)[0]
    for (path, a), b in zip(leaves_x, leaves_f):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(a).max(), 1e-4)
        err = np.abs(a - b).max() / s
        assert err < 8e-2, ("/".join(str(q) for q in path), err, s)


def test_fused_train_scan_backbone_masked_matches_xla(monkeypatch):
    """Token-mask training through the fused kernels: with
    enable_masking, stage 1's downsample LN + mask-token replacement run
    in XLA before the stage kernels (cfg ds_ln=False) — gradients,
    INCLUDING mask_token and the stage-1 LN affine, must match the XLA
    module path (which applies the mask inside the stage module,
    backbone.py:57-62)."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.detector import scan_backbone
    from rvt_tpu.parallel.mesh import make_mesh

    import rvt_tpu.models.detector as det

    # guard against the gate regressing to "mask -> XLA path" (which
    # would make this test a vacuous XLA-vs-XLA comparison)
    fused_calls = []
    orig_fused = det.fused_train_scan_backbone
    monkeypatch.setattr(
        det, "fused_train_scan_backbone",
        lambda *a, **k: (fused_calls.append(1), orig_fused(*a, **k))[1])

    T, B = 3, 2
    cfg = preset("gen1", "tiny", resolution_hw=(64, 80), sequence_length=T,
                 max_labels_per_frame=4, max_labeled_frames=2)
    cfg = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, enable_masking=True)))
    model_ref, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                         batch_size=B)
    cfg_f = replace(cfg, model=replace(
        cfg.model, backbone=replace(cfg.model.backbone, fused_kernels=True)))
    model_fused = RVTDetector(cfg=cfg_f.model)
    H, W = cfg.model.backbone.in_res_hw
    patch = cfg.model.backbone.stem_patch_size
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.randint(0, 8, (T, B, H, W, 20)), jnp.float32)
    # ~25% of stage-1 tokens masked, varying over (t, b)
    tm = jnp.asarray(rng.rand(T, B, H // patch, W // patch) < 0.25)
    states = zero_states(cfg.model.backbone, B)
    wgts = None

    def loss(params, model):
        feats, _ = scan_backbone(
            model, {"params": params}, ev, states, token_mask_seq=tm,
            deterministic=False, remat=True,
            mesh=make_mesh(1) if model is model_fused else None)
        total = 0.0
        nonlocal wgts
        if wgts is None:
            wgts = [jnp.asarray(np.random.RandomState(7).randn(*f.shape),
                                jnp.float32) for f in feats]
        for f, w in zip(feats, wgts):
            total = total + jnp.sum(f.astype(jnp.float32) * w)
        return total / ev.size

    params = variables["params"]
    assert "mask_token" in params["backbone"]["stage1"]
    g_x = jax.grad(lambda p: loss(p, model_ref))(params)
    g_f = jax.grad(lambda p: loss(p, model_fused))(params)
    assert fused_calls, "masked training did not take the fused path"
    leaves_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    leaves_f = jax.tree_util.tree_flatten(g_f)[0]
    checked = 0
    for (path, a), b in zip(leaves_x, leaves_f):
        name = "/".join(str(q) for q in path)
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(a).max(), 1e-4)
        err = np.abs(a - b).max() / s
        assert err < 8e-2, (name, err, s)
        if "mask_token" in name:
            # the mask-token gradient must actually flow (nonzero) and
            # agree — it only exists on the XLA prologue side
            assert np.abs(a).max() > 0
            checked += 1
    assert checked == 1


@pytest.mark.parametrize("H,W,C,part,dh", [
    (16, 10, 32, (8, 10), 32),   # partitioned mode
    (16, 24, 32, (2, 3), 32),    # masked-dense mode
])
def test_stage_scan_matches_per_step(H, W, C, part, dh):
    """The whole-window train scan (fused_stage_scan_train: time loop in
    the Pallas grid, weights staged once) vs a lax.scan over the per-step
    kernels. Forward must be BITWISE equal (identical per-step math; the
    saved bf16 h_seq is exactly the carry rounding the per-step kernel
    applies). Gradients agree to ~T bf16 ulps: the per-step path's scan
    transpose accumulates parameter cotangents across time in bf16
    (custom_vjp cotangents carry the primal dtype), while the scan kernel
    accumulates in f32 VMEM and rounds once — strictly tighter."""
    from rvt_tpu.ops.fused_train import (fused_stage_scan_train,
                                         fused_stage_step_train,
                                         train_block_params,
                                         train_stage_mode)

    mode = train_stage_mode(H, W, C, part)
    assert mode is not None
    geo = dict(H=H, W=W, part=part, dh=dh)
    pair, cell, pv, cv = _stage_params(geo, C, key=3)
    win = train_block_params(pv["params"]["att_window"], True)
    grd = train_block_params(pv["params"]["att_grid"], False)
    lp = cv["params"]["conv1x1"]
    lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
    lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
    rng = np.random.RandomState(1)
    T, B = 4, 2
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    eps = 1e-5
    cfg = (C // dh, dh, part, eps, eps, mode == "dense", True)
    wh = jnp.asarray(rng.randn(T, B, H, W, C), jnp.float32)
    wT = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)

    def outs_scan(x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0):
        return fused_stage_scan_train(cfg, x_seq, ds_s, ds_b, win, grd,
                                      lw, lb, h0, c0)

    def outs_step(x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0):
        def body(carry, x_t):
            h, c = carry
            h_t, c_t = fused_stage_step_train(cfg, x_t, ds_s, ds_b, win,
                                              grd, lw, lb, h, c)
            return (h_t, c_t), h_t.astype(jnp.bfloat16)
        (hT, cT), h_seq = jax.lax.scan(body, (h0, c0), x_seq)
        return h_seq, hT, cT

    args = (x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0)
    hs1, hT1, cT1 = outs_scan(*args)
    hs2, hT2, cT2 = outs_step(*args)
    assert float(jnp.max(jnp.abs(hs1.astype(jnp.float32)
                                 - hs2.astype(jnp.float32)))) == 0.0
    assert float(jnp.max(jnp.abs(hT1 - hT2))) == 0.0
    assert float(jnp.max(jnp.abs(cT1 - cT2))) == 0.0

    def loss(outs_fn, *a):
        h_seq, hT, cT = outs_fn(*a)
        return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                + jnp.sum(hT * wT) + 0.5 * jnp.sum(jnp.tanh(cT) * wT))

    g1 = jax.grad(lambda *a: loss(outs_scan, *a),
                  argnums=tuple(range(9)))(*args)
    g2 = jax.grad(lambda *a: loss(outs_step, *a),
                  argnums=tuple(range(9)))(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(b).max(), 1e-3)
        # bound: per-step bf16 accumulation noise, ~T bf16 ulps
        assert np.abs(a - b).max() / s < 2e-2


def test_train_stage_mode_split_envelope():
    """'split' is the whole-window answer for gen4-stage-1-class
    geometry (512k < elements/image <= 1M, partitioned); the per-step
    path and oversized stages still decline."""
    from rvt_tpu.ops.fused_train import train_stage_mode

    # gen4 ds2 stage 1: base (C=64, 983k) and small (C=48, 737k)
    assert train_stage_mode(96, 160, 64, (6, 10)) is None
    assert train_stage_mode(96, 160, 64, (6, 10), scan=True) == "split"
    assert train_stage_mode(96, 160, 48, (6, 10), scan=True) == "split"
    # tiny (C=32, 491k) fits the one-kernel envelope either way
    assert train_stage_mode(96, 160, 32, (6, 10)) == "part"
    assert train_stage_mode(96, 160, 32, (6, 10), scan=True) == "part"
    # full-res gen4 stage 1 (3.9M elements) exceeds even the split bound
    assert train_stage_mode(192, 320, 64, (6, 10), scan=True) is None


@pytest.mark.parametrize("H,W,C,part,dh", [(16, 10, 32, (8, 10), 32)])
def test_split_train_matches_stage_scan(H, W, C, part, dh, monkeypatch):
    """The split train composition (batched pair VJP + whole-window LSTM
    BPTT scan) vs the one-kernel whole-stage scan: forward must be
    BITWISE equal (same kernel bodies, f32 R2 handoff), gradients agree
    to f32-accumulation-order noise. The LSTM slab split is forced so the
    per-slab carry/cotangent path is exercised."""
    from rvt_tpu.ops import fused_train
    from rvt_tpu.ops.fused_train import (fused_stage_scan_train,
                                         split_stage_scan_train,
                                         train_block_params)

    # H=16 rows -> 2 slabs of 8 (8*10*32 = 2560 <= 4096 < 5120)
    monkeypatch.setattr(fused_train, "_TRAIN_SLAB_ELEMS", 4096)

    geo = dict(H=H, W=W, part=part, dh=dh)
    pair, cell, pv, cv = _stage_params(geo, C, key=5)
    win = train_block_params(pv["params"]["att_window"], True)
    grd = train_block_params(pv["params"]["att_grid"], False)
    lp = cv["params"]["conv1x1"]
    lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
    lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
    rng = np.random.RandomState(2)
    T, B = 4, 2
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    eps = 1e-5
    cfg = (C // dh, dh, part, eps, eps, False, True)
    wh = jnp.asarray(rng.randn(T, B, H, W, C), jnp.float32)
    wT = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)

    args = (x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0)
    hs1, hT1, cT1 = split_stage_scan_train(cfg, *args)
    hs2, hT2, cT2 = fused_stage_scan_train(cfg, *args)
    assert float(jnp.max(jnp.abs(hs1.astype(jnp.float32)
                                 - hs2.astype(jnp.float32)))) == 0.0
    assert float(jnp.max(jnp.abs(hT1 - hT2))) == 0.0
    assert float(jnp.max(jnp.abs(cT1 - cT2))) == 0.0

    def loss(fn, *a):
        h_seq, hT, cT = fn(cfg, *a)
        return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                + jnp.sum(hT * wT) + 0.5 * jnp.sum(jnp.tanh(cT) * wT))

    g1 = jax.grad(lambda *a: loss(split_stage_scan_train, *a),
                  argnums=tuple(range(9)))(*args)
    g2 = jax.grad(lambda *a: loss(fused_stage_scan_train, *a),
                  argnums=tuple(range(9)))(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(b).max(), 1e-3)
        # f32 weight-grad accumulators in both paths; only the grid
        # iteration order differs (frame-major vs (b, t))
        assert np.abs(a - b).max() / s < 4e-3


@pytest.mark.parametrize("H,W,C,part,dh", [(16, 10, 32, (8, 10), 32)])
def test_split_train_grads_match_xla(H, W, C, part, dh):
    """End-to-end gradient parity of the split train composition against
    the XLA module path (downsample LN + pair + cell under lax.scan)."""
    from rvt_tpu.ops.fused_train import (split_stage_scan_train,
                                         train_block_params)

    geo = dict(H=H, W=W, part=part, dh=dh)
    pair, cell, pv, cv = _stage_params(geo, C, key=6)
    rng = np.random.RandomState(3)
    T, B = 3, 2
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    eps = 1e-5
    wh = jnp.asarray(rng.randn(T, B, H, W, C), jnp.float32)
    wT = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)

    def total(h_seq, hT, cT):
        return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                + jnp.sum(hT * wT) + 0.5 * jnp.sum(jnp.tanh(cT) * wT))

    def xla_loss(x_seq, ds_s, ds_b, pv, cv, h0, c0):
        def step(carry, x_t):
            xf = x_t.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
            xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
                  * ds_s.astype(jnp.float32)
                  + ds_b.astype(jnp.float32)).astype(jnp.bfloat16)
            y = pair.apply(pv, xn, False)
            h_t, c_t = cell.apply(cv, y, carry, False)
            return (h_t, c_t), h_t.astype(jnp.bfloat16)
        (hT, cT), h_seq = jax.lax.scan(step, (h0, c0), x_seq)
        return total(h_seq, hT, cT)

    def fused_loss(x_seq, ds_s, ds_b, pv, cv, h0, c0):
        win = train_block_params(pv["params"]["att_window"], True)
        grd = train_block_params(pv["params"]["att_grid"], False)
        lp = cv["params"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
        cfg = (C // dh, dh, part, eps, eps, False, True)
        h_seq, hT, cT = split_stage_scan_train(
            cfg, x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0)
        return total(h_seq, hT, cT)

    args = (x_seq, ds_s, ds_b, pv, cv, h0, c0)
    gx = jax.grad(xla_loss, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gx)[0],
                            jax.tree.leaves(gf)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        s = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b).max() / s
        assert err < 5e-2, ("/".join(str(q) for q in path), err)
