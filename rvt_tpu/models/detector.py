"""RVT detector: recurrent backbone + PAFPN + YOLOX head.

Equivalent to ``models/detection/yolox_extension/models/detector.py:18-72``
with the same backbone/detect split so the TBPTT loop can run the backbone
per timestep and the detection pass once over gathered features — but the
temporal loop is a ``jax.lax.scan`` with donated carry instead of a Python
loop (see ``scan_backbone``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rvt_tpu.config import ModelConfig
from rvt_tpu.models.backbone import (BackboneFeatures, LstmStates, RVTBackbone,
                                     zero_states)
from rvt_tpu.models.yolox import YoloPAFPN, YoloXHead

Array = jax.Array


class RVTDetector(nn.Module):
    cfg: ModelConfig

    def setup(self):
        bb = self.cfg.backbone
        dtype = {"float32": None, "bfloat16": jnp.bfloat16}[self.cfg.compute_dtype]
        self.backbone = RVTBackbone(cfg=bb, dtype=dtype, name="backbone")
        in_stages = self.cfg.fpn.in_stages
        in_channels = tuple(bb.stage_dims[s - 1] for s in in_stages)
        strides = tuple(bb.strides[s - 1] for s in in_stages)
        self.fpn = YoloPAFPN(cfg=self.cfg.fpn, in_channels=in_channels,
                             dtype=dtype, name="fpn")
        self.head = YoloXHead(cfg=self.cfg.head, in_channels=in_channels,
                              strides=strides, dtype=dtype, name="head")

    def forward_backbone(self, x: Array, prev_states: LstmStates,
                         token_mask: Optional[Array] = None,
                         deterministic: bool = True) -> Tuple[BackboneFeatures, LstmStates]:
        return self.backbone(x, prev_states, token_mask, deterministic)

    def forward_detect(self, features: Sequence[Array], train: bool = False) -> Array:
        """features: stage maps at strides (8, 16, 32). Returns [B, A, 5+C]
        (decoded cxcywh + obj/cls logits)."""
        fpn_features = self.fpn(features, train)
        return self.head(fpn_features, train)

    def __call__(self, x: Array, prev_states: LstmStates,
                 token_mask: Optional[Array] = None,
                 train: bool = False) -> Tuple[Array, LstmStates]:
        """Single-timestep full forward (inference hot path)."""
        backbone_features, states = self.forward_backbone(
            x, prev_states, token_mask, deterministic=not train)
        feats = tuple(backbone_features[s] for s in self.cfg.fpn.in_stages)
        preds = self.forward_detect(feats, train)
        return preds, states


def init_detector(cfg: ModelConfig, rng: jax.Array, batch_size: int = 1,
                  dtype=jnp.float32) -> Tuple[RVTDetector, Any]:
    """Build the module and initialise variables with static shapes."""
    model = RVTDetector(cfg=cfg)
    x = jnp.zeros((batch_size,) + model_input_hw_c(cfg), dtype)
    states = zero_states(cfg.backbone, batch_size, dtype)
    variables = model.init(rng, x, states)
    return model, variables


def model_input_hw_c(cfg: ModelConfig) -> Tuple[int, int, int]:
    """Spatial+channel shape of one input frame (depends on stem_s2d)."""
    H, W = cfg.backbone.in_res_hw
    C = cfg.backbone.input_channels
    if cfg.backbone.stem_s2d:
        from rvt_tpu.ops.s2d import BLOCK, s2d_input_hw

        hp, wp = s2d_input_hw((H, W))
        return hp, wp, BLOCK * BLOCK * C
    return H, W, C


def scan_backbone(model: RVTDetector, variables, ev_seq: Array,
                  init_states: LstmStates, token_mask_seq: Optional[Array] = None,
                  deterministic: bool = True, remat: bool = True,
                  remat_policy=None, mesh=None,
                  ) -> Tuple[Tuple[Array, ...], LstmStates]:
    """Run the recurrent backbone over a [T, B, H, W, C] window.

    Replaces the reference's Python TBPTT loop (modules/detection.py:131-158)
    with ``lax.scan``: one compiled step body, hidden states as donated
    carry. Only the FPN input stages are stacked over time to bound HBM use.

    With ``fused_kernels`` serving configs the whole scan runs as one
    Pallas stage-scan kernel per stage instead (``fused_scan_backbone``);
    training configs take per-step custom-VJP Pallas kernels under the
    scan (``fused_train_scan_backbone``). The Pallas calls do not
    auto-partition, so their multi-device dispatch is explicit via
    ``mesh``:

      * ``mesh`` with >1 device: the fused scan runs under ``shard_map``
        over the mesh's batch axis (the kernels grid per image, so batch
        sharding is exact; parameter cotangents psum in the transpose).
        The batch must divide the mesh size, else the XLA path runs.
      * ``mesh`` with 1 device, or no mesh on a single-device runtime:
        direct fused call.
      * no mesh on a multi-device runtime: XLA path (safe fallback — jit
        auto-partitioning would choke on the Pallas calls).

    Returns (features_per_stage, final_states) where features_per_stage is a
    tuple over ``cfg.fpn.in_stages`` of [T, B, h, w, c] arrays.
    """
    # Serving never passes a token mask (masking is a train-time
    # augmentation, modules/detection.py:135-138); the fused TRAIN path
    # supports it natively — stage 1's downsample LN + mask-token
    # replacement run in XLA before the stage kernels (ds_ln=False).
    serving = deterministic and not remat
    fused_ok = _fused_scan_supported(model) and (
        token_mask_seq is None or not deterministic)
    if fused_ok and (serving or not deterministic):
        # Training with fused kernels: the custom VJP recomputes the
        # forward in-kernel, so the memory plan is fixed by design and
        # the ``remat`` flag is ignored on that path.
        if serving:
            fn = fused_scan_backbone
        else:
            def fn(model, variables, ev_seq, init_states, tm=None):
                return fused_train_scan_backbone(
                    model, variables, ev_seq, init_states,
                    token_mask_seq=tm)
        if mesh is not None and mesh.size > 1:
            if ev_seq.shape[1] % mesh.size == 0:
                return _shard_fused_scan(fn, model, variables, ev_seq,
                                         init_states, mesh,
                                         token_mask_seq=token_mask_seq)
        elif mesh is not None or jax.device_count() == 1:
            if token_mask_seq is None:
                return fn(model, variables, ev_seq, init_states)
            return fn(model, variables, ev_seq, init_states,
                      token_mask_seq)

    in_stages = model.cfg.fpn.in_stages

    def step(states, inp):
        x, tm = inp
        feats, new_states = model.apply(
            variables, x, states, tm, deterministic,
            method=RVTDetector.forward_backbone)
        return new_states, tuple(feats[s] for s in in_stages)

    if remat:
        # remat_policy selects which intermediates of the step body are
        # saved instead of recomputed in the backward pass (e.g.
        # jax.checkpoint_policies.dots_with_no_batch_dims_saveable keeps
        # matmul outputs); None = recompute everything.
        step = jax.checkpoint(step, policy=remat_policy)

    if token_mask_seq is None:
        # no mask -> no token replacement (the mask_token param exists but
        # is unused; reference passes token_masks=None the same way,
        # modules/detection.py:135-138)
        def step_no_mask(states, x):
            return step(states, (x, None))
        final_states, feats = jax.lax.scan(step_no_mask, init_states, ev_seq)
    else:
        # token_mask_seq: [T, B, h, w] bool at the stage-1 token grid
        # (in_res / stem_patch_size — identical with or without stem_s2d,
        # which only re-blocks the conv input, not the token grid)
        final_states, feats = jax.lax.scan(step, init_states,
                                           (ev_seq, token_mask_seq))
    return feats, final_states


def _shard_fused_scan(fn, model: RVTDetector, variables, ev_seq: Array,
                      init_states: LstmStates, mesh,
                      token_mask_seq: Optional[Array] = None
                      ) -> Tuple[Tuple[Array, ...], LstmStates]:
    """Data-parallel fused backbone scan over the mesh's (first) axis.

    The fused Pallas kernels grid per image, so slicing the batch axis is
    exact: each device runs the identical whole-window kernels on its
    batch shard. Parameters enter replicated (spec ``P()``); their
    gradient cotangents are psummed by the shard_map transpose, which is
    exactly the DP gradient all-reduce the XLA path gets from jit
    auto-partitioning (reference: DDP bucket all-reduce, train.py:60-67).

    ``check_vma=False``: Pallas calls carry no varying-manual-axes rule;
    correctness of the replicated-parameter transpose is covered by
    tests/test_shard_fused.py gradient-parity on a CPU mesh.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    if token_mask_seq is None:
        def body(variables, ev_seq, init_states):
            return fn(model, variables, ev_seq, init_states)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis), P(axis)),
            out_specs=(P(None, axis), P(axis)),
            check_vma=False)(variables, ev_seq, init_states)

    def body_tm(variables, ev_seq, init_states, tm):
        return fn(model, variables, ev_seq, init_states, tm)

    return jax.shard_map(
        body_tm, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(None, axis)),
        out_specs=(P(None, axis), P(axis)),
        check_vma=False)(variables, ev_seq, init_states, token_mask_seq)


def downsample_conv_apply(x: Array, sp, cfg, is_stem: bool,
                          dtype=jnp.bfloat16) -> Array:
    """The ConvDownsample conv alone (its LayerNorm runs inside the stage
    kernel). Bit-matches the module: bf16 operands, bias-free. Shared by
    the fused serving/train scans and tools/profile_fused."""
    from rvt_tpu.ops.s2d import fold_stem_kernel

    w = jnp.asarray(sp["downsample"]["conv"]["kernel"], jnp.float32)
    if is_stem and cfg.stem_s2d:
        w, strides, pad = fold_stem_kernel(w), (1, 1), [(0, 0), (0, 0)]
    elif is_stem:
        k = w.shape[0]
        strides = (cfg.stem_patch_size,) * 2
        pad = [(k // 2, k // 2)] * 2 if cfg.downsample.overlap else [(0, 0)] * 2
    else:
        k = w.shape[0]
        strides, pad = (2, 2), ([(k // 2, k // 2)] * 2
                                if cfg.downsample.overlap else [(0, 0)] * 2)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def downsample_ln_params(sp, cfg, C: int, dtype=jnp.bfloat16):
    """(scale, bias) of the downsample LayerNorm as [1, C] rows (identity
    when the config has no affine norm)."""
    if cfg.downsample.norm_affine:
        return (jnp.asarray(sp["downsample"]["norm"]["scale"],
                            dtype).reshape(1, -1),
                jnp.asarray(sp["downsample"]["norm"]["bias"],
                            dtype).reshape(1, -1))
    return (jnp.ones((1, C), dtype), jnp.zeros((1, C), dtype))


def _fused_scan_supported(model: RVTDetector) -> bool:
    """Gate for the whole-window stage-scan serving path: shipped config
    shape (bf16, 1 block per stage, plain MLP/LSTM variants). Token
    masking is supported on the TRAIN path (stage 1's LN + mask-token
    replacement run as an XLA prologue, kernels skip their in-kernel LN);
    an actual mask at serving time falls back to XLA in
    ``scan_backbone``. Per-stage VMEM envelopes are handled inside
    ``fused_scan_backbone`` (oversized stages scan per-step)."""
    cfg = model.cfg.backbone
    a, l = cfg.attention, cfg.lstm
    return (cfg.fused_kernels and model.cfg.compute_dtype == "bfloat16"
            and all(n == 1 for n in cfg.num_blocks)
            and not a.mlp_gated and a.attention_bias and a.mlp_bias
            and a.ls_init_value > 0 and a.drop_path == 0.0
            and a.drop_mlp == 0.0 and a.mlp_activation == "gelu"
            and not l.dws_conv and l.drop_cell_update == 0.0)


def fused_scan_backbone(model: RVTDetector, variables, ev_seq: Array,
                        init_states: LstmStates
                        ) -> Tuple[Tuple[Array, ...], LstmStates]:
    """Serving scan: per-stage whole-window Pallas kernels.

    Per stage: the downsample conv + LN runs in XLA, batched over the
    whole window (one conv of T*B images — weights load once, MXU batches
    well), then ``fused_stage_scan`` runs attention pair + ConvLSTM for
    all T steps in one kernel with the carry in VMEM (gen4 stage 1's
    983k-element maps included: MLP and LSTM epilogue run row-chunked
    under the geometry-scaled vmem cap). Stages whose working set
    exceeds even the widened scan envelope (>1M elements/image) fall
    back to a ``lax.scan`` over the per-step fused pair/cell kernels.

    Numerics match the lax.scan path at bf16 noise: inter-stage hidden
    states travel as bf16, which is exactly the cast the next conv / the
    FPN would apply.
    """
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_attention import (attention_block_params,
                                             stage_fusion_mode)
    from rvt_tpu.ops.fused_scan import fused_stage_scan, split_stage_scan

    cfg = model.cfg.backbone
    p = variables["params"]["backbone"]
    interpret = jax.default_backend() == "cpu"
    T, B = ev_seq.shape[:2]
    dtype = jnp.bfloat16

    x = ev_seq.reshape((T * B,) + ev_seq.shape[2:])
    feats = {}
    states_out = []
    for idx in range(cfg.num_stages):
        sp = p[f"stage{idx + 1}"]
        is_stem = idx == 0
        # pre-LN conv output, bf16
        x = downsample_conv_apply(x, sp, cfg, is_stem, dtype)
        h_dim, w_dim, C = x.shape[1:]
        x_seq = x.reshape(T, B, h_dim, w_dim, C)
        lp = sp["lstm"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], dtype).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], dtype).reshape(1, -1)
        h0, c0 = init_states[idx]
        ln_prm = downsample_ln_params(sp, cfg, C, dtype)

        mode = stage_fusion_mode(h_dim, w_dim, C,
                                 tuple(cfg.attention.partition_size),
                                 scan=True)
        if mode in ("part", "dense"):
            h_seq, hT, cT = fused_stage_scan(
                x_seq,
                attention_block_params(sp["block0"]["att_window"], True),
                attention_block_params(sp["block0"]["att_grid"], False),
                lw, lb, h0, c0,
                heads=C // cfg.attention.dim_head,
                dim_head=cfg.attention.dim_head,
                part=tuple(cfg.attention.partition_size),
                eps=cfg.attention.norm_eps,
                ds_ln_params=ln_prm, ds_eps=cfg.downsample.norm_eps,
                dense=mode == "dense",
                interpret=interpret)
        elif mode == "split":
            # gen4-stage-1-class stages (512k-1M elements/image): one
            # batched attention-pair launch over all T*B frames (the
            # downsample LN runs inside it) + the whole-window LSTM-scan
            # kernel with the carry in VMEM.
            h_seq, hT, cT = split_stage_scan(
                x_seq,
                attention_block_params(sp["block0"]["att_window"], True),
                attention_block_params(sp["block0"]["att_grid"], False),
                lw, lb, h0, c0,
                heads=C // cfg.attention.dim_head,
                dim_head=cfg.attention.dim_head,
                part=tuple(cfg.attention.partition_size),
                eps=cfg.attention.norm_eps,
                ds_ln_params=ln_prm, ds_eps=cfg.downsample.norm_eps,
                interpret=interpret)
        else:
            # oversized stages (>1M elements/image): downsample LN in
            # XLA (same math as in-kernel), then a per-step lax.scan
            # over the fused pair/cell kernels.
            s, b_ = [a.astype(jnp.float32) for a in ln_prm]
            xf = x_seq.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
            x_seq = ((xf - mu) * jax.lax.rsqrt(var + cfg.downsample.norm_eps)
                     * s + b_).astype(dtype)
            pair = MaxVitAttentionPair(dim=C, cfg=cfg.attention,
                                       skip_first_norm=True, dtype=dtype,
                                       fused=True)
            cell = DWSConvLSTM2d(dim=C, cfg=cfg.lstm, dtype=dtype,
                                 fused=True)
            pvars = {"params": sp["block0"]}
            cvars = {"params": {"conv1x1": lp}}

            def stage_step(carry, x_t, pair=pair, cell=cell,
                           pvars=pvars, cvars=cvars):
                y = pair.apply(pvars, x_t, True)
                h_t, c_t = cell.apply(cvars, y, carry, True)
                return (h_t, c_t), h_t.astype(dtype)

            (hT, cT), h_seq = jax.lax.scan(stage_step, (h0, c0), x_seq)

        states_out.append((hT, cT))
        feats[idx + 1] = h_seq
        x = h_seq.reshape(T * B, h_dim, w_dim, C)

    in_stages = model.cfg.fpn.in_stages
    return tuple(feats[s] for s in in_stages), tuple(states_out)


def fused_train_scan_backbone(model: RVTDetector, variables, ev_seq: Array,
                              init_states: LstmStates,
                              per_step: bool = False,
                              token_mask_seq: Optional[Array] = None
                              ) -> Tuple[Tuple[Array, ...], LstmStates]:
    """Differentiable fused backbone scan for TRAINING.

    Same structure as ``fused_scan_backbone`` (downsample convs in XLA,
    batched over the whole window); each stage runs its WHOLE window as
    one custom-VJP Pallas scan kernel with the LSTM carry in VMEM
    (``ops/fused_train.fused_stage_scan_train`` — forward one kernel,
    backward three, weights staged once per window). ``per_step=True``
    forces the older per-timestep kernels under ``lax.scan``
    (``fused_stage_step_train``; same numerics, kept for A/B profiling).
    gen4-stage-1-class stages (512k-1M elements/image) train through the
    'split' kernel composition (``split_stage_scan_train``); only stages
    beyond even that envelope (>1M elements/image) run the XLA module
    path under ``jax.checkpoint``.

    Runs on one device's batch shard: multi-device data-parallel training
    reaches this through ``scan_backbone``'s ``shard_map`` dispatch (the
    transpose psums the replicated-parameter cotangents = the DP gradient
    all-reduce). Reference loop: modules/detection.py:131-158.
    """
    from rvt_tpu.models.layers import DWSConvLSTM2d, MaxVitAttentionPair
    from rvt_tpu.ops.fused_train import (fused_stage_scan_train,
                                         fused_stage_step_train,
                                         split_stage_scan_train,
                                         train_block_params,
                                         train_stage_mode)

    cfg = model.cfg.backbone
    p = variables["params"]["backbone"]
    interpret = jax.default_backend() == "cpu"
    T, B = ev_seq.shape[:2]
    dtype = jnp.bfloat16

    x = ev_seq.reshape((T * B,) + ev_seq.shape[2:])
    feats = {}
    states_out = []
    for idx in range(cfg.num_stages):
        sp = p[f"stage{idx + 1}"]
        is_stem = idx == 0
        # pre-LN conv output, bf16
        x = downsample_conv_apply(x, sp, cfg, is_stem, dtype)
        h_dim, w_dim, C = x.shape[1:]
        x_seq = x.reshape(T, B, h_dim, w_dim, C)
        lp = sp["lstm"]["conv1x1"]
        lw = jnp.asarray(lp["kernel"], dtype).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lp["bias"], dtype).reshape(1, -1)
        h0, c0 = init_states[idx]
        ln_prm = downsample_ln_params(sp, cfg, C, dtype)
        part = tuple(cfg.attention.partition_size)
        mode = train_stage_mode(h_dim, w_dim, C, part, scan=not per_step)

        # mirror the module's gating (backbone.py: mask ignored unless
        # enable_token_masking, which is stage-1-only)
        masked = (token_mask_seq is not None and idx == 0
                  and cfg.enable_masking)
        if masked:
            # The reference applies the mask token to the LN'd downsample
            # output (maxvit_rnn.py:174-176). Run stage 1's downsample LN
            # + mask-token replacement here in XLA (differentiable,
            # fused by the compiler into the conv epilogue) and have the
            # kernels skip their in-kernel LN (cfg ds_ln=False); the
            # LN-affine and mask-token gradients flow through this XLA
            # prologue, the kernels' ds_s/ds_b cotangents are zero.
            s_, b_ = [a.astype(jnp.float32) for a in ln_prm]
            xf = x_seq.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
            xn = ((xf - mu) * jax.lax.rsqrt(var + cfg.downsample.norm_eps)
                  * s_ + b_).astype(dtype)
            mt = jnp.asarray(sp["mask_token"], dtype).reshape(1, 1, 1, 1, C)
            x_seq = jnp.where(token_mask_seq[..., None], mt, xn)

        if mode is not None:
            step_cfg = (C // cfg.attention.dim_head,
                        cfg.attention.dim_head, part,
                        cfg.attention.norm_eps, cfg.downsample.norm_eps,
                        mode == "dense", interpret) + (
                            (False,) if masked else ())
            win = train_block_params(sp["block0"]["att_window"], True)
            grd = train_block_params(sp["block0"]["att_grid"], False)

            if not per_step:
                # gen4-stage-1-class stages (512k-1M elements/image)
                # train through the split composition: batched pair VJP
                # over T*B frames + whole-window LSTM BPTT scan kernel
                scan_fn = (split_stage_scan_train if mode == "split"
                           else fused_stage_scan_train)
                h_seq, hT, cT = scan_fn(
                    step_cfg, x_seq, ln_prm[0], ln_prm[1], win, grd, lw,
                    lb, h0, c0)
                states_out.append((hT, cT))
                feats[idx + 1] = h_seq
                x = h_seq.reshape(T * B, h_dim, w_dim, C)
                continue

            def stage_step(carry, x_t, step_cfg=step_cfg, ln_prm=ln_prm,
                           win=win, grd=grd, lw=lw, lb=lb):
                h, c = carry
                h_t, c_t = fused_stage_step_train(
                    step_cfg, x_t, ln_prm[0], ln_prm[1], win, grd, lw,
                    lb, h, c)
                return (h_t, c_t), h_t.astype(dtype)
        else:
            # oversized stage: XLA modules (natively differentiable),
            # downsample LN in XLA, rematerialised per step
            s_, b_ = [a.astype(jnp.float32) for a in ln_prm]

            if masked:
                # LN + mask replacement already applied above
                def ln(x_t):
                    return x_t
            else:
                def ln(x_t):
                    xf = x_t.astype(jnp.float32)
                    mu = jnp.mean(xf, axis=-1, keepdims=True)
                    var = jnp.maximum(
                        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                        0.0)
                    return ((xf - mu) * jax.lax.rsqrt(
                        var + cfg.downsample.norm_eps) * s_ + b_
                            ).astype(dtype)

            pair = MaxVitAttentionPair(dim=C, cfg=cfg.attention,
                                       skip_first_norm=True, dtype=dtype,
                                       fused=False)
            cell = DWSConvLSTM2d(dim=C, cfg=cfg.lstm, dtype=dtype,
                                 fused=False)
            pvars = {"params": sp["block0"]}
            cvars = {"params": {"conv1x1": lp}}

            @jax.checkpoint
            def stage_step(carry, x_t, pair=pair, cell=cell, pvars=pvars,
                           cvars=cvars, ln=ln):
                y = pair.apply(pvars, ln(x_t), False)
                h_t, c_t = cell.apply(cvars, y, carry, False)
                return (h_t, c_t), h_t.astype(dtype)

        (hT, cT), h_seq = jax.lax.scan(stage_step, (h0, c0), x_seq)
        states_out.append((hT, cT))
        feats[idx + 1] = h_seq
        x = h_seq.reshape(T * B, h_dim, w_dim, C)

    in_stages = model.cfg.fpn.in_stages
    return tuple(feats[s] for s in in_stages), tuple(states_out)
