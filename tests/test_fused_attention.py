"""Fused Pallas attention pair (ops/fused_attention.py) vs the XLA path.

On CPU the kernel runs in interpret mode (models/layers.py picks
``interpret=jax.default_backend() == "cpu"``); the same comparison runs
lowered on the real chip via tools/verify_tpu_kernels.py and the bench.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rvt_tpu.config import AttentionConfig
from rvt_tpu.models.layers import MaxVitAttentionPair

GEOMS = [
    # (H, W, C, dim_head, part, skip_first_norm)
    (16, 20, 64, 32, (8, 10), True),
    (16, 20, 64, 32, (8, 10), False),
    (8, 10, 128, 32, (8, 10), True),    # single window/grid partition
    (16, 20, 48, 24, (8, 10), True),    # small-model head dim
    (12, 20, 64, 32, (6, 10), False),   # gen4 partition
    (8, 10, 512, 32, (8, 10), True),    # stage-4 dims: two-kernel split
    (16, 24, 64, 32, (2, 3), True),     # masked-dense (Mosaic rejects
    (16, 24, 64, 32, (2, 3), False),    # the (8, 3) W-dim lane split)
]


def _build(geom, fused):
    H, W, C, dh, part, sfn = geom
    cfg = AttentionConfig(partition_size=part, dim_head=dh)
    mod = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=sfn,
                              dtype=jnp.bfloat16, fused=fused)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, C), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), x)
    # perturb LN/LS params away from their identity-ish init
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.asarray(
            np.random.RandomState(3).randn(*a.shape), a.dtype), variables)
    return mod, variables, x


@pytest.mark.parametrize("geom", GEOMS)
def test_fused_pair_matches_xla_path(geom):
    mod_ref, variables, x = _build(geom, fused=False)
    mod_fused, _, _ = _build(geom, fused=True)
    ref = np.asarray(mod_ref.apply(variables, x), np.float32)
    got = np.asarray(mod_fused.apply(variables, x), np.float32)
    assert got.dtype == ref.dtype
    # bf16-rounding-order differences only (inputs are unit scale)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)
    assert np.abs(got - ref).mean() < 3e-3


def test_gen4_stage1_fuses_with_chunked_mlp():
    """gen4 stage-1 geometry (96x160x64) fits the kernel since the MLP runs
    row-chunked -> the fused path must agree with XLA at bf16 noise."""
    H, W, C = 96, 160, 64
    cfg = AttentionConfig(partition_size=(6, 10), dim_head=32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, C), jnp.bfloat16)
    mod_ref = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                  dtype=jnp.bfloat16, fused=False)
    variables = mod_ref.init(jax.random.PRNGKey(1), x)
    mod_fused = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                    dtype=jnp.bfloat16, fused=True)
    ref = np.asarray(mod_ref.apply(variables, x), np.float32)
    got = np.asarray(mod_fused.apply(variables, x), np.float32)
    assert not np.array_equal(got, ref)  # proves the fused path was taken
    np.testing.assert_allclose(got, ref, atol=1.5e-2)


def test_fused_falls_back_when_oversized():
    """Beyond the 1M-elements/image VMEM envelope the module must use the
    XLA path (bit-identical to fused=False)."""
    H, W, C = 192, 160, 64
    cfg = AttentionConfig(partition_size=(6, 10), dim_head=32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, C), jnp.bfloat16)
    mod_ref = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                  dtype=jnp.bfloat16, fused=False)
    variables = mod_ref.init(jax.random.PRNGKey(1), x)
    mod_fused = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                    dtype=jnp.bfloat16, fused=True)
    ref = np.asarray(mod_ref.apply(variables, x))
    got = np.asarray(mod_fused.apply(variables, x))
    np.testing.assert_array_equal(got, ref)


def test_fused_falls_back_nonstandard_geometry():
    """A geometry whose partition chunks Mosaic cannot lane-split AND
    whose token count exceeds the masked-dense envelope must silently
    take the XLA path (bit-identical to fused=False) instead of raising
    a Mosaic compile error."""
    from rvt_tpu.ops.fused_attention import pair_fusion_mode

    H, W, C, part = 40, 48, 64, (2, 3)
    assert pair_fusion_mode(H, W, C, part) is None
    cfg = AttentionConfig(partition_size=part, dim_head=32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, C), jnp.bfloat16)
    mod_ref = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                  dtype=jnp.bfloat16, fused=False)
    variables = mod_ref.init(jax.random.PRNGKey(1), x)
    mod_fused = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                                    dtype=jnp.bfloat16, fused=True)
    ref = np.asarray(mod_ref.apply(variables, x))
    got = np.asarray(mod_fused.apply(variables, x))
    np.testing.assert_array_equal(got, ref)


def test_fused_detector_eval_matches_xla_path():
    """Full tiny detector, fused on/off: head outputs must agree within
    bf16 noise through the whole backbone (4 stages x window+grid)."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states

    cfg = preset("gen1", "tiny")
    cfg = replace(cfg, model=replace(cfg.model, compute_dtype="bfloat16"))
    model_ref, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                         batch_size=1)
    cfg_f = replace(cfg, model=replace(
        cfg.model,
        backbone=replace(cfg.model.backbone, fused_kernels=True)))
    model_fused = RVTDetector(cfg=cfg_f.model)
    H, W = cfg.model.backbone.in_res_hw
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 8, (1, H, W, 20)), jnp.float32)
    states = zero_states(cfg.model.backbone, 1)

    ref, _ = model_ref.apply(variables, x, states)
    got, _ = model_fused.apply(variables, x, states)
    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    scale = np.abs(ref).mean()
    assert np.abs(got - ref).max() < 0.05 * max(scale, 1.0)
    assert np.abs(got - ref).mean() < 5e-3 * max(scale, 1.0)


def test_fused_ignored_in_training_mode():
    """deterministic=False must take the XLA path (differentiable)."""
    geom = (16, 20, 64, 32, (8, 10), False)
    mod, variables, x = _build(geom, fused=True)

    def loss(v):
        return jnp.sum(mod.apply(v, x, False,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
                       .astype(jnp.float32))

    g = jax.grad(loss)(variables)
    norms = [float(jnp.linalg.norm(leaf.astype(jnp.float32)))
             for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms) and any(n > 0 for n in norms)


def test_whole_stage_fused_matches_module_path():
    """RVTStage with fused_kernels serves attention pair + ConvLSTM as one
    kernel (backbone.py:_whole_stage_fused); outputs must agree with the
    XLA module path at bf16 noise."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models.backbone import RVTStage

    cfg = preset("gen1", "tiny").model.backbone
    B, H, W = 2, 64, 80
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 20) * 2,
                    jnp.float32)
    h = jnp.asarray(np.random.RandomState(1).randn(B, H // 4, W // 4,
                                                   cfg.stage_dims[0]) * 0.5,
                    jnp.float32)
    c = jnp.asarray(np.random.RandomState(2).randn(B, H // 4, W // 4,
                                                   cfg.stage_dims[0]) * 0.5,
                    jnp.float32)

    outs = {}
    for fused in (False, True):
        bb = replace(cfg, fused_kernels=fused)
        stage = RVTStage(dim_out=cfg.stage_dims[0],
                         downsample_factor=cfg.stem_patch_size,
                         num_blocks=1, enable_token_masking=False,
                         cfg=bb, dtype=jnp.bfloat16)
        variables = outs.get("vars")
        if variables is None:
            variables = stage.init(jax.random.PRNGKey(0), x, (h, c), None,
                                   True)
            outs["vars"] = variables
        out, (h_t, c_t) = stage.apply(variables, x, (h, c), None, True)
        outs[fused] = (np.asarray(out, np.float32), np.asarray(h_t),
                       np.asarray(c_t))

    # the fused path must actually differ bitwise (proves dispatch)...
    assert not np.array_equal(outs[True][0], outs[False][0])
    # ...but agree numerically
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(a, b, atol=2.5e-2)


def test_fused_scan_backbone_matches_lax_scan():
    """The whole-window stage-scan serving path (fused_scan_backbone:
    per-stage Pallas kernels with VMEM carries, batched downsample convs)
    must match the per-step lax.scan path at bf16 noise, including the
    final carry states."""
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
    # non-zero initial states exercise the carry init
    states = jax.tree.map(
        lambda x: x + 0.1 * jnp.asarray(
            np.random.RandomState(7).randn(*x.shape), x.dtype), states)

    feats_r, st_r = scan_backbone(model_ref, variables, ev, states,
                                  remat=False)
    feats_f, st_f = scan_backbone(model_fused, variables, ev, states,
                                  remat=False, mesh=make_mesh(1))
    assert feats_f[0].dtype == jnp.bfloat16  # proves the fused path ran
    for fr, ff in zip(feats_r, feats_f):
        fr = np.asarray(fr, np.float32)
        ff = np.asarray(ff, np.float32)
        scale = max(np.abs(fr).max(), 1.0)
        assert np.abs(fr - ff).max() < 0.05 * scale
    for (hr, cr), (hf, cf) in zip(st_r, st_f):
        np.testing.assert_allclose(np.asarray(hf), np.asarray(hr), atol=4e-2)
        np.testing.assert_allclose(np.asarray(cf), np.asarray(cr), atol=8e-2)


def test_fused_scan_backbone_s2d_stem_in_kernel():
    """stem_s2d serving: the folded 2x2 stem conv + LN run inside the
    stage-1 scan kernel; must match the XLA module path."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.detector import scan_backbone
    from rvt_tpu.parallel.mesh import make_mesh
    from rvt_tpu.ops.s2d import device_space_to_depth

    T, B = 2, 1
    cfg = preset("gen1", "tiny", resolution_hw=(64, 80), sequence_length=T,
                 max_labels_per_frame=4, max_labeled_frames=2)
    cfg = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, stem_s2d=True)))
    model_ref, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                         batch_size=B)
    cfg_f = replace(cfg, model=replace(
        cfg.model, backbone=replace(cfg.model.backbone, fused_kernels=True)))
    model_fused = RVTDetector(cfg=cfg_f.model)

    H, W = cfg.model.backbone.in_res_hw
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 8, (T, B, 60, 76, 20)), jnp.uint8)
    ev = device_space_to_depth(raw, (H, W))
    states = zero_states(cfg.model.backbone, B)

    feats_r, st_r = scan_backbone(model_ref, variables, ev, states,
                                  remat=False)
    feats_f, st_f = scan_backbone(model_fused, variables, ev, states,
                                  remat=False, mesh=make_mesh(1))
    assert feats_f[0].dtype == jnp.bfloat16
    for fr, ff in zip(feats_r, feats_f):
        fr = np.asarray(fr, np.float32)
        ff = np.asarray(ff, np.float32)
        scale = max(np.abs(fr).max(), 1.0)
        assert np.abs(fr - ff).max() < 0.05 * scale
    for (hr, cr), (hf, cf) in zip(st_r, st_f):
        np.testing.assert_allclose(np.asarray(hf), np.asarray(hr), atol=4e-2)


def test_stage_scan_chunked_lstm_epilogue_bitwise(monkeypatch):
    """gen4 stage 1 runs the stage-scan kernel with its LSTM epilogue
    row-chunked (ops/fused_scan._CHUNK_ELEMS). The cell math is
    token-pointwise, so chunked and monolithic must be BITWISE equal —
    pinned here by forcing chunking at a tiny geometry."""
    from rvt_tpu.ops import fused_scan
    from rvt_tpu.ops.fused_attention import attention_block_params

    H, W, C, dh, part = 16, 20, 64, 32, (8, 10)
    T, B = 3, 2
    cfg = AttentionConfig(partition_size=part, dim_head=dh)
    mod = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                              dtype=jnp.bfloat16, fused=False)
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), x1)
    p = variables["params"]
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
    lw = jnp.asarray(rng.randn(2 * C, 4 * C) * 0.05, jnp.bfloat16)
    lb = jnp.asarray(rng.randn(1, 4 * C) * 0.05, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    args = (x_seq, attention_block_params(p["att_window"], True),
            attention_block_params(p["att_grid"], False), lw, lb, h0, c0)
    kw = dict(heads=C // dh, dim_head=dh, part=part, eps=cfg.norm_eps,
              interpret=True)

    ref = fused_scan.fused_stage_scan(*args, **kw)
    fused_scan.fused_stage_scan.clear_cache()
    # force the chunked path: every map "exceeds" the threshold and the
    # 9*chunk*C*4-byte budget forces several row chunks
    monkeypatch.setattr(fused_scan, "_CHUNK_ELEMS", 0)
    monkeypatch.setattr(fused_scan, "_CHUNK_TARGET",
                        (H * W // 4) * C * 4 * 9)
    got = fused_scan.fused_stage_scan(*args, **kw)
    fused_scan.fused_stage_scan.clear_cache()
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_stage_scan_envelope_gen4_stage1():
    """The scan envelope admits gen4 stage 1 (983k elements) for the
    whole-window kernel while the per-step whole-stage kernel keeps its
    tighter bound; >1M elements falls out of both."""
    from rvt_tpu.ops.fused_attention import stage_fusion_mode

    assert stage_fusion_mode(96, 160, 64, (6, 10), scan=True) == "split"
    assert stage_fusion_mode(96, 160, 64, (6, 10)) is None
    assert stage_fusion_mode(192, 160, 64, (6, 10), scan=True) is None


@pytest.mark.parametrize("geom", [(16, 20, 64), (64, 64, 64)])
def test_fused_lstm_scan_matches_per_step_cell(geom, monkeypatch):
    """The whole-window LSTM-scan kernel (split serving mode) must match
    per-step cell math; the larger geometry forces the row-slab split
    (the slab threshold is monkeypatched below its Hs*W*C)."""
    from rvt_tpu.ops import fused_scan
    from rvt_tpu.ops.fused_scan import fused_lstm_scan

    H, W, C = geom
    if H * W * C > 128 * 1024:
        monkeypatch.setattr(fused_scan, "_SLAB_ELEMS", 128 * 1024)
        fused_lstm_scan.clear_cache()
    T, B = 3, 2
    rng = np.random.RandomState(0)
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C) * 0.5, jnp.bfloat16)
    lw = jnp.asarray(rng.randn(2 * C, 4 * C) * 0.05, jnp.bfloat16)
    lb = jnp.asarray(rng.randn(1, 4 * C) * 0.05, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    h_seq, hT, cT = fused_lstm_scan(x_seq, lw, lb, h0, c0, interpret=True)

    h_ref, c_ref = h0, c0
    for t in range(T):
        xh = jnp.concatenate([x_seq[t], h_ref.astype(jnp.bfloat16)], -1)
        mix = (jnp.einsum("bhwc,cd->bhwd", xh, lw).astype(jnp.bfloat16)
               + lb.reshape(1, 1, 1, -1))
        g = jax.nn.sigmoid(mix[..., :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16).astype(jnp.float32)
        ci = jnp.tanh(mix[..., 3 * C:].astype(jnp.float32)
                      ).astype(jnp.bfloat16).astype(jnp.float32)
        c_ref = g[..., :C] * c_ref + g[..., C:2 * C] * ci
        h_ref = g[..., 2 * C:] * jnp.tanh(c_ref)
        d = float(jnp.max(jnp.abs(h_seq[t].astype(jnp.float32) - h_ref)))
        assert d < 2e-2, (t, d)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(c_ref), atol=4e-2)
    if H * W * C > 128 * 1024:
        fused_lstm_scan.clear_cache()  # drop the patched-slab compilation


def test_split_stage_scan_in_kernel_ln_matches_module_path():
    """split_stage_scan with ds_ln_params (raw downsample-conv output in,
    LN inside the batched pair kernel) must match XLA LN + per-step
    module pair + cell math — the gen4 stage-1 serving path."""
    from rvt_tpu.ops.fused_attention import attention_block_params
    from rvt_tpu.ops.fused_scan import split_stage_scan

    H, W, C, dh, part = 16, 20, 64, 32, (8, 10)
    T, B = 3, 2
    cfg = AttentionConfig(partition_size=part, dim_head=dh)
    mod = MaxVitAttentionPair(dim=C, cfg=cfg, skip_first_norm=True,
                              dtype=jnp.bfloat16, fused=False)
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(1), x1)
    p = variables["params"]
    x_raw = jnp.asarray(rng.randn(T, B, H, W, C) * 2.0, jnp.bfloat16)
    lw = jnp.asarray(rng.randn(2 * C, 4 * C) * 0.05, jnp.bfloat16)
    lb = jnp.asarray(rng.randn(1, 4 * C) * 0.05, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ln_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    eps = 1e-5

    h_seq, hT, cT = split_stage_scan(
        x_raw, attention_block_params(p["att_window"], True),
        attention_block_params(p["att_grid"], False), lw, lb, h0, c0,
        heads=C // dh, dim_head=dh, part=part, eps=cfg.norm_eps,
        ds_ln_params=(ln_s, ln_b), ds_eps=eps, interpret=True)

    # oracle: XLA LN -> module pair -> cell, per step
    xf = x_raw.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    x_n = ((xf - mu) * jax.lax.rsqrt(var + eps)
           * ln_s.astype(jnp.float32).reshape(1, 1, 1, 1, C)
           + ln_b.astype(jnp.float32).reshape(1, 1, 1, 1, C)
           ).astype(jnp.bfloat16)
    h_ref, c_ref = h0, c0
    for t in range(T):
        a = mod.apply(variables, x_n[t])
        xh = jnp.concatenate([a.astype(jnp.bfloat16),
                              h_ref.astype(jnp.bfloat16)], -1)
        mix = (jnp.einsum("bhwc,cd->bhwd", xh, lw).astype(jnp.bfloat16)
               + lb.reshape(1, 1, 1, -1))
        g = jax.nn.sigmoid(mix[..., :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16).astype(jnp.float32)
        ci = jnp.tanh(mix[..., 3 * C:].astype(jnp.float32)
                      ).astype(jnp.bfloat16).astype(jnp.float32)
        c_ref = g[..., :C] * c_ref + g[..., C:2 * C] * ci
        h_ref = g[..., 2 * C:] * jnp.tanh(c_ref)
        d = float(jnp.max(jnp.abs(h_seq[t].astype(jnp.float32) - h_ref)))
        assert d < 5e-2, (t, d)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h_ref), atol=5e-2)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(c_ref), atol=1e-1)
