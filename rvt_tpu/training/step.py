"""Jitted train / eval steps: TBPTT over a window, detection pass on
gathered labelled frames, SimOTA loss, AdamW update.

This is the TPU-native equivalent of the reference Lightning module's
``training_step`` / ``_val_test_step_impl`` (``modules/detection.py:104-286``):

  * the Python per-timestep loop becomes ``lax.scan`` (models/detector.py),
  * the dynamic "collect features at labelled steps" list
    (``BackboneFeatureSelector``, modules/utils/detection.py:24-45) becomes
    a static top-K gather per batch lane with a validity mask,
  * LSTM states are a pytree carried between calls and reset per lane via
    ``is_first_sample`` (replaces the worker-keyed RNNStates registry),
  * the TBPTT gradient cut (save_states_and_detach) is implicit: states
    re-enter the next jit call as fresh device arrays,
  * gradients average across the data-parallel mesh automatically (batch is
    dp-sharded, params replicated; XLA inserts the psum).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from rvt_tpu.config import ExperimentConfig
from rvt_tpu.models.backbone import LstmStates, zero_states
from rvt_tpu.models.detector import RVTDetector, scan_backbone
from rvt_tpu.models.yolox import make_grids_and_strides
from rvt_tpu.ops.boxes import postprocess
from rvt_tpu.training.losses import yolox_loss

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def head_grid(cfg: ExperimentConfig) -> Tuple[np.ndarray, np.ndarray]:
    H, W = cfg.model.backbone.in_res_hw
    strides = tuple(cfg.model.backbone.strides[s - 1]
                    for s in cfg.model.fpn.in_stages)
    hw = [(H // s, W // s) for s in strides]
    grid, stride = make_grids_and_strides(hw, strides)
    return grid, stride[:, 0]


def reset_states(states: LstmStates, is_first_sample: Array) -> LstmStates:
    """Zero the (h, c) of lanes whose stream restarted
    (RNNStates.reset, modules/utils/detection.py:76-113)."""
    def mask(x: Array) -> Array:
        m = is_first_sample.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, jnp.zeros_like(x), x)
    return jax.tree.map(mask, states)


def gather_labeled_frames(feats: Tuple[Array, ...], frame_valid: Array,
                          max_frames: int):
    """Select up to K labelled frames per lane with static shapes.

    feats: tuple of [T, B, h, w, c]; frame_valid: [B, T].
    Returns (gathered feats tuple of [B*K, h, w, c], frame_idx [B, K],
    gathered_valid [B, K]). Frames keep time order; excess labelled frames
    beyond K are dropped (K is configured to cover the label cadence).
    """
    B, T = frame_valid.shape
    K = max_frames
    # stable argsort: invalid frames sort last, ties keep time order
    order = jnp.argsort(jnp.where(frame_valid, 0, 1), axis=1, stable=True)
    frame_idx = order[:, :K]  # [B, K]
    gathered_valid = jnp.take_along_axis(frame_valid, frame_idx, axis=1)

    def gather_one(f: Array) -> Array:
        f = jnp.swapaxes(f, 0, 1)  # [B, T, h, w, c]
        idx = frame_idx.reshape(B, K, 1, 1, 1)
        g = jnp.take_along_axis(f, idx, axis=1)
        return g.reshape((B * K,) + f.shape[2:])

    return tuple(gather_one(f) for f in feats), frame_idx, gathered_valid


def gather_labels(labels: Array, label_mask: Array, frame_idx: Array):
    """labels: [B, T, M, 7] storage rows -> yolox targets [B*K, M, 5] +
    mask. Conversion (cls, cx, cy, w, h) mirrors labels.py:341-355."""
    B, T, M, _ = labels.shape
    K = frame_idx.shape[1]
    idx = frame_idx.reshape(B, K, 1, 1)
    lab = jnp.take_along_axis(labels, idx, axis=1).reshape(B * K, M, 7)
    mask = jnp.take_along_axis(label_mask, frame_idx.reshape(B, K, 1),
                               axis=1).reshape(B * K, M)
    cls = lab[..., 5]
    cx = lab[..., 1] + 0.5 * lab[..., 3]
    cy = lab[..., 2] + 0.5 * lab[..., 4]
    yolox = jnp.stack([cls, cx, cy, lab[..., 3], lab[..., 4]], axis=-1)
    return yolox, mask


def pad_token_mask(tm: Array, in_res_hw: Tuple[int, int],
                   patch_size: int) -> Array:
    """Corner-pad a [..., h, w] stage-1 token mask from the storage
    resolution's token grid to the model resolution's (padding tokens are
    never masked). Mirrors utils/padding.py:55-63."""
    th, tw = in_res_hw[0] // patch_size, in_res_hw[1] // patch_size
    ph, pw = th - tm.shape[-2], tw - tm.shape[-1]
    assert ph >= 0 and pw >= 0, (tm.shape, (th, tw))
    if ph or pw:
        pad = [(0, 0)] * (tm.ndim - 2) + [(0, ph), (0, pw)]
        tm = jnp.pad(tm, pad)
    return tm


def pad_ev_repr(ev: Array, target_hw: Tuple[int, int], dtype,
                stem_s2d: bool = False) -> Array:
    """Zero-pad bottom/right to the model resolution and convert dtype
    (corner padding, utils/padding.py:28-53). ``dtype=None`` keeps the
    storage dtype (usually uint8) — the stem then casts per scan step
    inside the jit region, so the full [B, T, H, W, C] window is never
    materialised at 2-4 bytes/element in HBM. In stem_s2d mode the host
    pipeline already emitted padded+blocked tensors (ops/s2d.py) — only the
    shape is checked."""
    if stem_s2d:
        from rvt_tpu.ops.s2d import s2d_input_hw

        assert ev.shape[-3:-1] == s2d_input_hw(target_hw), \
            f"expected s2d-blocked input, got {ev.shape}"
        return ev if dtype is None else ev.astype(dtype)
    H, W = ev.shape[-3], ev.shape[-2]
    ph, pw = target_hw[0] - H, target_hw[1] - W
    assert ph >= 0 and pw >= 0
    if ph or pw:
        pad = [(0, 0)] * (ev.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        ev = jnp.pad(ev, pad)
    return ev if dtype is None else ev.astype(dtype)


def make_train_step(model: RVTDetector, cfg: ExperimentConfig,
                    optimizer: optax.GradientTransformation,
                    donate: bool = True, mesh=None,
                    with_detections: bool = False,
                    with_param_metrics: bool = False):
    """``mesh``: the data-parallel mesh the step will run over. Required
    for the fused Pallas backbone paths to engage on >1 device (they are
    dispatched via shard_map, see models/detector.py:scan_backbone);
    without it a multi-device runtime falls back to the XLA backbone.

    ``with_detections``: also postprocess (sigmoid + confidence filter +
    NMS) the decoded head outputs of the same forward pass and return
    ``(dets, det_valid, frame_idx, gval)`` as a 4th result — the on-device
    half of the reference's train-time detection metrics
    (modules/detection.py:175-205, which postprocesses training
    predictions every step). Compiled as a separate step so the extra NMS
    work only runs on the trainer's detection-metric cadence.

    ``with_param_metrics``: also emit per-parameter mean-|grad| and
    mean-|weight| scalars (reference GradFlowLogCallback + logger.watch).
    Off by default: the ~2x250 per-leaf reductions are tiny kernel-launch-
    bound ops that cost real step time on TPU, so the trainer compiles
    this variant separately and runs it only on the gradflow cadence."""
    grid_np, stride_np = head_grid(cfg)
    grid = jnp.asarray(grid_np)
    anchor_strides = jnp.asarray(stride_np)
    num_classes = cfg.model.head.num_classes
    K = cfg.dataset.max_labeled_frames
    # Inputs/states enter in f32; bf16 MXU compute is selected by the
    # model's cfg.compute_dtype (see models/layers.py dtype threading) while
    # master params, norms and LSTM state math stay f32.
    compute_dtype = jnp.float32
    in_res = cfg.model.backbone.in_res_hw

    def loss_fn(params, batch_stats, ev_seq, init_states, labels, label_mask,
                frame_valid, token_mask_seq):
        variables = {"params": params, "batch_stats": batch_stats}
        # scan backbone over time; batch_stats are only used by FPN/head
        # (the backbone has no BN), so the scan body is read-only on them.
        feats, final_states = scan_backbone(
            model, variables, ev_seq, init_states,
            token_mask_seq=token_mask_seq,
            deterministic=False, remat=True, mesh=mesh)

        gathered, frame_idx, gval = gather_labeled_frames(feats, frame_valid, K)
        yolox_labels, yl_mask = gather_labels(labels, label_mask, frame_idx)

        preds, mutated = model.apply(
            variables, gathered, train=True,
            method=RVTDetector.forward_detect,
            mutable=["batch_stats"])

        losses = yolox_loss(preds, yolox_labels, yl_mask,
                            gval.reshape(-1), grid, anchor_strides,
                            num_classes)
        aux = (mutated["batch_stats"], final_states, losses)
        if with_detections:
            aux = aux + (jax.lax.stop_gradient(preds), frame_idx, gval)
        return losses["loss"], aux

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, lstm_states: LstmStates,
                   ev_repr: Array, labels: Array, label_mask: Array,
                   frame_valid: Array, is_first_sample: Array,
                   token_mask: Array = None):
        """One TBPTT window. ev_repr: [B, T, H, W, C] (storage resolution).

        token_mask: optional [B, T, h, w] bool at the storage resolution's
        stage-1 token grid (only meaningful with
        cfg.model.backbone.enable_masking; reference
        modules/detection.py:135-138).

        Returns (new_state, new_lstm_states, metrics).
        """
        lstm_states = reset_states(lstm_states, is_first_sample)
        ev_seq = pad_ev_repr(ev_repr, in_res, compute_dtype,
                             cfg.model.backbone.stem_s2d)
        ev_seq = jnp.swapaxes(ev_seq, 0, 1)  # [T, B, H, W, C]
        token_mask_seq = None
        if token_mask is not None:
            token_mask_seq = jnp.swapaxes(
                pad_token_mask(token_mask, in_res,
                               cfg.model.backbone.stem_patch_size), 0, 1)

        init_states = jax.tree.map(lambda x: x.astype(compute_dtype),
                                   lstm_states)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(
            state.params, state.batch_stats, ev_seq, init_states,
            labels.astype(jnp.float32), label_mask, frame_valid,
            token_mask_seq)
        new_bs, final_states, losses = aux[:3]

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt_state, step=state.step + 1)
        final_states = jax.tree.map(lambda x: x.astype(jnp.float32),
                                    final_states)
        metrics = {k: v for k, v in losses.items()}
        # one ravel (XLA CSEs it against the optimizer's own flatten) ->
        # a single large reduction, instead of ~250 per-leaf norms
        metrics["grad_norm"] = jnp.linalg.norm(
            jax.flatten_util.ravel_pytree(grads)[0])
        if with_param_metrics:
            # per-parameter mean |grad| (reference GradFlowLogCallback,
            # callbacks/gradflow.py:17-51) + weight magnitudes (the scalar
            # core of logger.watch's weight histograms, train.py:104)
            for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                metrics[f"gradflow/{name}"] = jnp.mean(jnp.abs(leaf))
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    new_params)[0]:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                metrics[f"weights/{name}"] = jnp.mean(jnp.abs(leaf))
        if not with_detections:
            return new_state, final_states, metrics

        # Postprocess the training-batch predictions exactly as the eval
        # step does (reference: modules/detection.py:177-181 runs the same
        # postprocess on the train forward's outputs).
        preds, frame_idx, gval = aux[3:]
        pp = cfg.model.postprocess
        infer = jnp.concatenate(
            [preds[..., :4], jax.nn.sigmoid(preds[..., 4:])], axis=-1)
        dets, det_valid = postprocess(
            infer, num_classes, pp.confidence_threshold, pp.nms_threshold,
            pp.pre_nms_topk, pp.max_detections)
        B, Kk = frame_idx.shape
        dets = dets.reshape(B, Kk, *dets.shape[1:])
        det_valid = det_valid.reshape(B, Kk, -1) & gval[..., None]
        return new_state, final_states, metrics, (dets, det_valid,
                                                  frame_idx, gval)

    return train_step


def make_eval_step(model: RVTDetector, cfg: ExperimentConfig,
                   dtype=None, mesh=None):
    """Streaming evaluation step: scan, gather labelled frames, detect,
    on-device NMS. Mirrors _val_test_step_impl (modules/detection.py:208-280)
    with stream-mode prediction collection.

    ``dtype=None`` (default) scans the window in its storage dtype — the
    stem converts uint8 -> compute dtype one step at a time, avoiding a
    full-window f32 materialisation (4x the HBM traffic of the uint8 copy
    and ~1.5 ms/window on v5e).

    ``mesh``: pass the dp mesh when evaluating sharded over >1 device so
    the fused serving kernels engage via shard_map (without it, a
    multi-device runtime takes the XLA backbone — see scan_backbone)."""
    K = cfg.dataset.max_labeled_frames
    pp = cfg.model.postprocess
    num_classes = cfg.model.head.num_classes
    in_res = cfg.model.backbone.in_res_hw

    @jax.jit
    def eval_step(variables, lstm_states: LstmStates, ev_repr: Array,
                  frame_valid: Array, is_first_sample: Array):
        lstm_states = reset_states(lstm_states, is_first_sample)
        ev_seq = pad_ev_repr(ev_repr, in_res, dtype,
                             cfg.model.backbone.stem_s2d)
        ev_seq = jnp.swapaxes(ev_seq, 0, 1)

        feats, final_states = scan_backbone(model, variables, ev_seq,
                                            lstm_states, deterministic=True,
                                            remat=False, mesh=mesh)
        gathered, frame_idx, gval = gather_labeled_frames(feats, frame_valid, K)
        preds = model.apply(variables, gathered, train=False,
                            method=RVTDetector.forward_detect)
        infer = jnp.concatenate(
            [preds[..., :4], jax.nn.sigmoid(preds[..., 4:])], axis=-1)
        dets, det_valid = postprocess(
            infer, num_classes, pp.confidence_threshold, pp.nms_threshold,
            pp.pre_nms_topk, pp.max_detections)
        B, Kk = frame_idx.shape
        dets = dets.reshape(B, Kk, *dets.shape[1:])
        det_valid = det_valid.reshape(B, Kk, -1) & gval[..., None]
        return final_states, dets, det_valid, frame_idx, gval

    return eval_step


def init_train_state(model: RVTDetector, cfg: ExperimentConfig,
                     optimizer: optax.GradientTransformation,
                     rng: jax.Array) -> TrainState:
    from rvt_tpu.models.detector import model_input_hw_c

    x = jnp.zeros((1,) + model_input_hw_c(model.cfg), jnp.float32)
    variables = model.init(rng, x, zero_states(cfg.model.backbone, 1))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=jnp.zeros((), jnp.int32))
