"""Verify + time the Pallas TPU kernels on the real chip (lowered, not
interpret mode). Run on hardware:

    python -m tools.verify_tpu_kernels [check ...]

with checks from {voxelizer, lstm, attention, stage_scan, train, all}
(default: all). Each check compiles independently, so a single-kernel
regression run costs one remote compile, not the whole ~30-minute
suite.

Checks, against their XLA oracles:
  * voxelizer — stacked_histogram_pallas_batched, bit-exact equality on
    gen1-geometry uniform and worst-case clustered event sets, plus a
    wall-clock comparison vs the XLA scatter path,
  * lstm / attention / stage_scan — the fused serving kernels (incl. the
    masked-dense small-geometry path that Mosaic's partition reshapes
    reject, e.g. the tiny 64x80 config),
  * train — the custom-VJP training kernels (ops/fused_train.py):
    gradient parity vs the XLA path, lowered.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def _verify_voxelizer() -> int:
    import jax
    import jax.numpy as jnp

    from rvt_tpu.ops.voxelization import (stacked_histogram,
                                          stacked_histogram_pallas_batched)

    B, N, bins, H, W = 8, 32768, 10, 240, 304
    rng = np.random.RandomState(0)
    cases = {}
    x = rng.randint(0, W, (B, N)).astype(np.int32)
    y = rng.randint(0, H, (B, N)).astype(np.int32)
    cases["uniform"] = (x, y)
    cases["clustered"] = (np.full((B, N), 5, np.int32),
                          np.full((B, N), 17, np.int32))
    p = rng.randint(0, 2, (B, N)).astype(np.int32)
    t = np.sort(rng.randint(0, 50000, (B, N)), axis=1).astype(np.int32)
    counts = np.full((B,), N - 123, np.int32)
    pj, tj, cj = map(jnp.asarray, (p, t, counts))

    ref_fn = jax.jit(jax.vmap(lambda a, b, c, d, n: stacked_histogram(
        a, b, c, d, n, bins, H, W)))
    pallas_fn = jax.jit(lambda a, b, c, d, n: stacked_histogram_pallas_batched(
        a, b, c, d, n, bins=bins, height=H, width=W))

    failures = 0
    for name, (cx, cy) in cases.items():
        xj, yj = jnp.asarray(cx), jnp.asarray(cy)
        ref = np.asarray(ref_fn(xj, yj, pj, tj, cj))
        got = np.asarray(pallas_fn(xj, yj, pj, tj, cj))
        ok = np.array_equal(got, ref)
        failures += not ok
        print(f"voxelizer/{name}: {'OK' if ok else 'MISMATCH'} "
              f"(sum={got.sum()})")

    xj, yj = map(jnp.asarray, cases["uniform"])
    t_xla = timeit(ref_fn, xj, yj, pj, tj, cj)
    t_pal = timeit(pallas_fn, xj, yj, pj, tj, cj)
    print(f"voxelizer 8x32k gen1: XLA scatter {t_xla:.2f} ms, "
          f"Pallas {t_pal:.2f} ms ({t_xla / t_pal:.2f}x)")
    return failures


_CHECKS = {
    "voxelizer": _verify_voxelizer,
    "lstm": lambda: _verify_fused_lstm(),
    "attention": lambda: _verify_fused_attention(),
    "stage_scan": lambda: _verify_stage_scan(),
    "train": lambda: _verify_fused_train(),
}


def main(argv=None) -> int:
    import jax

    print("devices:", jax.devices())
    names = list(argv or sys.argv[1:]) or ["all"]
    if "all" in names:
        names = list(_CHECKS)
    failures = 0
    for name in names:
        failures += _CHECKS[name]()
    return failures


def _verify_stage_scan() -> int:
    """Lowered whole-window stage-scan kernel vs the per-step lax.scan
    module path on the full tiny detector geometry."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.detector import scan_backbone

    T, B = 4, 2
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
    feats_r, st_r = scan_backbone(model_ref, variables, ev, states,
                                  remat=False)
    feats_f, st_f = scan_backbone(model_fused, variables, ev, states,
                                  remat=False)
    ok = True
    for fr, ff in zip(feats_r, feats_f):
        d = float(jnp.max(jnp.abs(ff.astype(jnp.float32)
                                  - fr.astype(jnp.float32))))
        s = float(jnp.max(jnp.abs(fr.astype(jnp.float32))))
        ok &= d < 0.05 * max(s, 1.0)
    for (hr, _), (hf, _) in zip(st_r, st_f):
        ok &= float(jnp.max(jnp.abs(hf - hr))) < 5e-2
    print(f"stage_scan/tiny-4step: {'OK' if ok else 'MISMATCH'}")

    # gen4 stage 1 (983k elements/image): the 'split' scan mode — one
    # batched attention-pair launch over T*B frames + the whole-window
    # LSTM-scan kernel with the carry in VMEM.
    from rvt_tpu.config import AttentionConfig
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_attention import (attention_block_params,
                                             stage_fusion_mode)
    from rvt_tpu.ops.fused_scan import split_stage_scan

    H, W, C, dh, part = 96, 160, 64, 32, (6, 10)
    T, B = 3, 1
    assert stage_fusion_mode(H, W, C, part, scan=True) == "split"
    acfg = AttentionConfig(partition_size=part, dim_head=dh)
    pair = MaxVitAttentionPair(dim=C, cfg=acfg, skip_first_norm=True,
                               dtype=jnp.bfloat16, fused=False)
    rng = np.random.RandomState(1)
    x1 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    pvars = pair.init(jax.random.PRNGKey(2), x1)
    p = pvars["params"]
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C) * 0.5, jnp.bfloat16)
    lw = jnp.asarray(rng.randn(2 * C, 4 * C) * 0.05, jnp.bfloat16)
    lb = jnp.asarray(rng.randn(1, 4 * C) * 0.05, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    h_seq, hT, cT = split_stage_scan(
        x_seq, attention_block_params(p["att_window"], True),
        attention_block_params(p["att_grid"], False), lw, lb, h0, c0,
        heads=C // dh, dim_head=dh, part=part, eps=acfg.norm_eps)
    # XLA oracle: per-step pair + cell math (same as the module path)
    h_ref, c_ref = h0, c0

    def cell(x, h, c):
        xh = jnp.concatenate([x.astype(jnp.bfloat16),
                              h.astype(jnp.bfloat16)], -1)
        mix = (jnp.einsum("bhwc,cd->bhwd", xh, lw.astype(jnp.bfloat16))
               .astype(jnp.bfloat16) + lb.reshape(1, 1, 1, -1))
        g = jax.nn.sigmoid(mix[..., :3 * C].astype(jnp.float32)
                           ).astype(jnp.bfloat16).astype(jnp.float32)
        ci = jnp.tanh(mix[..., 3 * C:].astype(jnp.float32)
                      ).astype(jnp.bfloat16).astype(jnp.float32)
        cn = g[..., :C] * c + g[..., C:2 * C] * ci
        return g[..., 2 * C:] * jnp.tanh(cn), cn

    ok4 = True
    for t in range(T):
        a = pair.apply(pvars, x_seq[t])
        h_ref, c_ref = cell(a, h_ref, c_ref)
        d = float(jnp.max(jnp.abs(h_seq[t].astype(jnp.float32)
                                  - h_ref.astype(jnp.float32))))
        ok4 &= d < 5e-2
    ok4 &= float(jnp.max(jnp.abs(hT - h_ref))) < 5e-2
    ok4 &= float(jnp.max(jnp.abs(cT - c_ref))) < 1e-1
    print(f"stage_scan/gen4-stage1: {'OK' if ok4 else 'MISMATCH'}")

    # gen1 stage 2 (32x40x128, part (8, 10)): the even-minor-chunk
    # geometries re-admitted to 'part' mode by the round-3 envelope fix
    # (partition_geometry_ok) — parity of the one-kernel stage scan vs
    # the per-step XLA oracle, lowered. One geometry stands in for the
    # family (stages 2-4 gen1 / 2-4 gen4 share the code path).
    from rvt_tpu.ops.fused_scan import fused_stage_scan
    H, W, C, dh, part = 32, 40, 128, 32, (8, 10)
    assert stage_fusion_mode(H, W, C, part, scan=True) == "part"
    acfg = AttentionConfig(partition_size=part, dim_head=dh)
    pair = MaxVitAttentionPair(dim=C, cfg=acfg, skip_first_norm=True,
                               dtype=jnp.bfloat16, fused=False)
    rng = np.random.RandomState(3)
    x1 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    pvars = pair.init(jax.random.PRNGKey(4), x1)
    p = pvars["params"]
    T, B = 3, 2
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C) * 0.5, jnp.bfloat16)
    lw = jnp.asarray(rng.randn(2 * C, 4 * C) * 0.05, jnp.bfloat16)
    lb = jnp.asarray(rng.randn(1, 4 * C) * 0.05, jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    h_seq, hT, cT = fused_stage_scan(
        x_seq, attention_block_params(p["att_window"], True),
        attention_block_params(p["att_grid"], False), lw, lb, h0, c0,
        heads=C // dh, dim_head=dh, part=part, eps=acfg.norm_eps,
        dense=False)
    h_ref, c_ref = h0, c0
    okp = True
    for t in range(T):
        a = pair.apply(pvars, x_seq[t])
        h_ref, c_ref = cell(a, h_ref, c_ref)
        d = float(jnp.max(jnp.abs(h_seq[t].astype(jnp.float32)
                                  - h_ref.astype(jnp.float32))))
        okp &= d < 5e-2
    okp &= float(jnp.max(jnp.abs(hT - h_ref))) < 5e-2
    okp &= float(jnp.max(jnp.abs(cT - c_ref))) < 1e-1
    print(f"stage_scan/gen1-stage2-part: {'OK' if okp else 'MISMATCH'}")
    return int(not ok) + int(not ok4) + int(not okp)


def _verify_fused_lstm() -> int:
    """Lowered fused ConvLSTM vs the XLA module path (bf16-noise bound)."""
    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import LstmConfig
    from rvt_tpu.models.layers import DWSConvLSTM2d
    from rvt_tpu.ops.fused_lstm import fused_conv_lstm

    failures = 0
    for B, H, W, C in [(8, 64, 80, 64), (8, 6, 10, 512)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
        c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5)
        mod = DWSConvLSTM2d(dim=C, cfg=LstmConfig(dws_conv=False),
                            dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x, (h, c), True)
        h_ref, c_ref = mod.apply(params, x, (h, c), True)
        p = params["params"]["conv1x1"]
        w = jnp.asarray(p["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
        b = jnp.asarray(p["bias"], jnp.bfloat16).reshape(1, -1)
        h_f, c_f = fused_conv_lstm(x, h, c, w, b)
        dh = float(jnp.max(jnp.abs(h_f - h_ref)))
        dc = float(jnp.max(jnp.abs(c_f - c_ref)))
        ok = dh < 1e-2 and dc < 2e-2
        failures += not ok
        print(f"fused_lstm/{H}x{W}x{C}: {'OK' if ok else 'MISMATCH'} "
              f"(dh={dh:.2e} dc={dc:.2e})")
        fused = jax.jit(lambda x, h, c: fused_conv_lstm(x, h, c, w, b))
        xla = jax.jit(lambda x, h, c: mod.apply(params, x, (h, c), True))
        t_f = timeit(lambda *a: fused(*a)[0], x, h, c)
        t_x = timeit(lambda *a: xla(*a)[0], x, h, c)
        print(f"  XLA {t_x:.2f} ms, Pallas {t_f:.2f} ms ({t_x / t_f:.2f}x)")
    return failures


def _verify_fused_attention() -> int:
    """Lowered fused attention pair vs the XLA module path."""
    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import AttentionConfig
    from rvt_tpu.models.layers import MaxVitAttentionPair

    failures = 0
    for H, W, C, part in [(64, 80, 64, (8, 10)), (8, 10, 512, (8, 10)),
                          (96, 160, 64, (6, 10))]:  # last: gen4 stage 1
        cfg = AttentionConfig(partition_size=part, dim_head=32)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, H, W, C), jnp.bfloat16)
        mods = {}
        for fused in (False, True):
            mods[fused] = MaxVitAttentionPair(dim=C, cfg=cfg,
                                              skip_first_norm=True,
                                              dtype=jnp.bfloat16, fused=fused)
        variables = mods[False].init(jax.random.PRNGKey(1), x)
        outs = {f: m.apply(variables, x, True) for f, m in mods.items()}
        d = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                  - outs[False].astype(jnp.float32))))
        ok = 0 < d < 2e-2  # d == 0 would mean the fused path fell back
        failures += not ok
        print(f"fused_attention/{H}x{W}x{C}: {'OK' if ok else 'MISMATCH'} "
              f"(d={d:.2e})")
        ts = {}
        for f, m in mods.items():
            ap = jax.jit(lambda x, m=m: m.apply(variables, x, True))
            ts[f] = timeit(ap, x)
        print(f"  XLA {ts[False]:.2f} ms, Pallas {ts[True]:.2f} ms "
              f"({ts[False] / ts[True]:.2f}x)")
    return failures


def _verify_fused_train() -> int:
    """Lowered custom-VJP train kernels: gradient parity vs the XLA
    module path at one partitioned and one masked-dense geometry, plus a
    step-time comparison."""
    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import AttentionConfig, LstmConfig
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_train import (fused_stage_step_train,
                                         train_block_params,
                                         train_stage_mode)

    failures = 0
    for H, W, C, part, dh in [(64, 80, 32, (8, 10), 32),
                              (16, 24, 32, (2, 3), 32)]:
        mode = train_stage_mode(H, W, C, part)
        assert mode is not None, (H, W, part)
        pair = MaxVitAttentionPair(dim=C, cfg=AttentionConfig(
            partition_size=part, dim_head=dh), skip_first_norm=True,
            dtype=jnp.bfloat16, fused=False)
        cell = DWSConvLSTM2d(dim=C, cfg=LstmConfig(dws_conv=False),
                             dtype=jnp.bfloat16, fused=False)
        rng = np.random.RandomState(0)
        B = 2
        x0 = jnp.zeros((1, H, W, C), jnp.bfloat16)
        hz = jnp.zeros((1, H, W, C), jnp.float32)
        pv = pair.init(jax.random.PRNGKey(0), x0)
        cv = cell.init(jax.random.PRNGKey(1), x0, (hz, hz))
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
        c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
        ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
        ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
        wgt = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
        eps = 1e-5

        def xla_loss(pv, cv, x=x, h0=h0, c0=c0, ds_s=ds_s, ds_b=ds_b,
                     wgt=wgt, pair=pair, cell=cell):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
            xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
                  * ds_s.astype(jnp.float32)
                  + ds_b.astype(jnp.float32)).astype(jnp.bfloat16)
            h_t, _ = cell.apply(cv, pair.apply(pv, xn, False), (h0, c0),
                                False)
            return jnp.sum(h_t * wgt)

        def fused_loss(pv, cv, x=x, h0=h0, c0=c0, ds_s=ds_s, ds_b=ds_b,
                       wgt=wgt, C=C, dh=dh, part=part, mode=mode):
            win = train_block_params(pv["params"]["att_window"], True)
            grd = train_block_params(pv["params"]["att_grid"], False)
            lp = cv["params"]["conv1x1"]
            lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C,
                                                                 4 * C)
            lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
            cfg = (C // dh, dh, part, eps, eps, mode == "dense", False)
            h_t, _ = fused_stage_step_train(cfg, x, ds_s, ds_b, win, grd,
                                            lw, lb, h0, c0)
            return jnp.sum(h_t * wgt)

        g_x = jax.jit(jax.grad(xla_loss, argnums=(0, 1)))(pv, cv)
        g_f = jax.jit(jax.grad(fused_loss, argnums=(0, 1)))(pv, cv)
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_f)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            worst = max(worst, np.abs(a - b).max()
                        / max(np.abs(a).max(), 1e-3))
        ok = worst < 6e-2
        failures += not ok
        print(f"fused_train/{H}x{W}x{C} [{mode}]: "
              f"{'OK' if ok else 'MISMATCH'} (worst rel err={worst:.2e})")
    failures += _verify_fused_train_scan()
    return failures


def _verify_fused_train_scan() -> int:
    """Lowered whole-window train scan (fused_stage_scan_train): forward
    bitwise + gradient parity vs a lax.scan over the per-step kernels at
    RVT-T gen1 stage-1 geometry, plus a window fwd+bwd time comparison.
    Gradient tolerance 2e-2: the per-step reference accumulates parameter
    cotangents across time in bf16 (custom_vjp cotangent dtype), the scan
    kernel in f32 — the scan side is the tighter one."""
    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import AttentionConfig, LstmConfig
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_train import (fused_stage_scan_train,
                                         fused_stage_step_train,
                                         train_block_params,
                                         train_stage_mode)

    failures = 0
    for H, W, C, part, dh, T in [(64, 80, 32, (8, 10), 32, 21),
                                 (16, 24, 32, (2, 3), 32, 8)]:
        mode = train_stage_mode(H, W, C, part)
        assert mode is not None, (H, W, part)
        pair = MaxVitAttentionPair(dim=C, cfg=AttentionConfig(
            partition_size=part, dim_head=dh), skip_first_norm=True,
            dtype=jnp.bfloat16, fused=False)
        cell = DWSConvLSTM2d(dim=C, cfg=LstmConfig(dws_conv=False),
                             dtype=jnp.bfloat16, fused=False)
        rng = np.random.RandomState(0)
        B = 8
        x0 = jnp.zeros((1, H, W, C), jnp.bfloat16)
        hz = jnp.zeros((1, H, W, C), jnp.float32)
        pv = pair.init(jax.random.PRNGKey(0), x0)
        cv = cell.init(jax.random.PRNGKey(1), x0, (hz, hz))
        win = train_block_params(pv["params"]["att_window"], True)
        grd = train_block_params(pv["params"]["att_grid"], False)
        lp = cv["params"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
        x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
        h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
        c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
        wh = jnp.asarray(rng.randn(T, B, H, W, C) * 0.05, jnp.float32)
        ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
        ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
        eps = 1e-5
        cfg = (C // dh, dh, part, eps, eps, mode == "dense", False)

        # wh as an ARGUMENT, not a closure: embedded as an MLIR constant
        # it bloats the remote-compile payload (see _verify_split_train)
        def loss_scan(x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0, wh):
            h_seq, hT, cT = fused_stage_scan_train(
                cfg, x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0)
            return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                    + jnp.sum(hT) + jnp.sum(cT))

        def loss_step(x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0, wh):
            def body(carry, x_t):
                h, c = carry
                h_t, c_t = fused_stage_step_train(
                    cfg, x_t, ds_s, ds_b, win, grd, lw, lb, h, c)
                return (h_t, c_t), h_t.astype(jnp.bfloat16)
            (hT, cT), h_seq = jax.lax.scan(body, (h0, c0), x_seq)
            return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                    + jnp.sum(hT) + jnp.sum(cT))

        args = (x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0, wh)
        argnums = tuple(range(9))
        vg_scan = jax.jit(jax.value_and_grad(loss_scan, argnums=argnums))
        vg_step = jax.jit(jax.value_and_grad(loss_step, argnums=argnums))
        v1, g1 = vg_scan(*args)
        v2, g2 = vg_step(*args)
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            worst = max(worst, np.abs(a - b).max()
                        / max(np.abs(b).max(), 1e-3))
        ok = worst < 2e-2 and abs(float(v1) - float(v2)) < 1e-2 * max(
            abs(float(v2)), 1.0)
        failures += not ok
        t_scan = timeit(lambda *a: vg_scan(*a)[0], *args)
        t_step = timeit(lambda *a: vg_step(*a)[0], *args)
        print(f"fused_train_scan/{H}x{W}x{C}xT{T} [{mode}]: "
              f"{'OK' if ok else 'MISMATCH'} (worst rel err={worst:.2e}) "
              f"scan {t_scan*1e3:.2f} ms vs per-step {t_step*1e3:.2f} ms "
              f"per window fwd+bwd")
    return failures


def _verify_split_train() -> int:
    """Lowered 'split' train mode (split_stage_scan_train: batched pair
    VJP + whole-window LSTM BPTT scan) at REAL gen4-ds2 stage-1 geometry
    (96x160x64, 983k elements/image — beyond the one-kernel train
    envelope): gradient parity vs the XLA module path, plus a window
    fwd+bwd time comparison against that XLA fallback (which is what gen4
    stage 1 trained on before this mode existed)."""
    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import AttentionConfig, LstmConfig
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_train import (split_stage_scan_train,
                                         train_block_params,
                                         train_stage_mode)

    failures = 0
    H, W, C, part, dh, T, B = 96, 160, 64, (6, 10), 32, 5, 2
    assert train_stage_mode(H, W, C, part, scan=True) == "split"
    pair = MaxVitAttentionPair(dim=C, cfg=AttentionConfig(
        partition_size=part, dim_head=dh), skip_first_norm=True,
        dtype=jnp.bfloat16, fused=False)
    cell = DWSConvLSTM2d(dim=C, cfg=LstmConfig(dws_conv=False),
                         dtype=jnp.bfloat16, fused=False)
    rng = np.random.RandomState(0)
    x0 = jnp.zeros((1, H, W, C), jnp.bfloat16)
    hz = jnp.zeros((1, H, W, C), jnp.float32)
    pv = pair.init(jax.random.PRNGKey(0), x0)
    cv = cell.init(jax.random.PRNGKey(1), x0, (hz, hz))
    x_seq = jnp.asarray(rng.randn(T, B, H, W, C), jnp.bfloat16)
    h0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.randn(B, H, W, C) * 0.3, jnp.float32)
    ds_s = jnp.asarray(1.0 + 0.1 * rng.randn(1, C), jnp.bfloat16)
    ds_b = jnp.asarray(0.1 * rng.randn(1, C), jnp.bfloat16)
    wh = jnp.asarray(rng.randn(T, B, H, W, C) * 0.05, jnp.float32)
    eps = 1e-5

    # NOTE: the loss weight wh (39 MB f32) must be an ARGUMENT of the
    # jitted functions — closed over, it is embedded in the serialized
    # MLIR as a constant and the 39 MB payload OOM-kills the remote
    # compile helper (observed: code_len 39.4 MB -> SIGKILL).
    def total(h_seq, hT, cT, wh):
        return (jnp.sum(h_seq.astype(jnp.float32) * wh)
                + jnp.sum(hT) + jnp.sum(cT))

    def xla_loss(pv, cv, x_seq, ds_s, ds_b, h0, c0, wh):
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
        return total(h_seq, hT, cT, wh)

    def split_loss(pv, cv, x_seq, ds_s, ds_b, h0, c0, wh):
        win = train_block_params(pv["params"]["att_window"], True)
        grd = train_block_params(pv["params"]["att_grid"], False)
        lp = cv["params"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], jnp.bfloat16).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], jnp.bfloat16).reshape(1, -1)
        cfg = (C // dh, dh, part, eps, eps, False, False)
        h_seq, hT, cT = split_stage_scan_train(
            cfg, x_seq, ds_s, ds_b, win, grd, lw, lb, h0, c0)
        return total(h_seq, hT, cT, wh)

    args = (pv, cv, x_seq, ds_s, ds_b, h0, c0, wh)
    argnums = tuple(range(7))
    vg_x = jax.jit(jax.value_and_grad(xla_loss, argnums=argnums))
    vg_s = jax.jit(jax.value_and_grad(split_loss, argnums=argnums))
    v1, g1 = vg_s(*args)
    finite = all(bool(jnp.all(jnp.isfinite(g)))
                 for g in jax.tree_util.tree_leaves(g1))
    t_split = timeit(lambda *a: vg_s(*a)[0], *args)
    try:
        v2, g2 = vg_x(*args)
    except Exception as e:  # noqa: BLE001 — remote compiler death
        # The XLA module path itself fails to compile at this geometry
        # on this toolchain (observed: the compile helper is OOM-killed
        # on the 983k-element attention backward even with a 120 KB
        # payload) — i.e. the pre-split-mode "fallback" for gen4 stage-1
        # TRAINING was not actually runnable here, and the split kernels
        # are the only working path. Gradient-parity coverage for the
        # split composition lives in tests/test_fused_train.py
        # (interpret mode) and in the one-kernel-vs-XLA checks above at
        # in-envelope geometries.
        ok = finite
        failures += not ok
        print(f"split_train/gen4-stage1 {H}x{W}x{C}xT{T}xB{B}: "
              f"{'OK' if ok else 'MISMATCH'} (split fwd+bwd "
              f"{t_split:.2f} ms/window, grads finite={finite}; XLA "
              f"oracle UNCOMPILABLE at this geometry: "
              f"{str(e).splitlines()[0][:120]})")
        return failures
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        worst = max(worst, np.abs(a - b).max()
                    / max(np.abs(b).max(), 1e-3))
    ok = worst < 6e-2 and abs(float(v1) - float(v2)) < 1e-2 * max(
        abs(float(v2)), 1.0)
    failures += not ok
    t_xla = timeit(lambda *a: vg_x(*a)[0], *args)
    print(f"split_train/gen4-stage1 {H}x{W}x{C}xT{T}xB{B}: "
          f"{'OK' if ok else 'MISMATCH'} (worst rel err={worst:.2e}) "
          f"split {t_split:.2f} ms vs XLA {t_xla:.2f} ms "
          f"({t_xla / t_split:.2f}x) per window fwd+bwd")
    return failures


_CHECKS["split_train"] = _verify_split_train


if __name__ == "__main__":
    raise SystemExit(main())
