"""Training orchestration: stream scheduling, TBPTT steps, metrics,
checkpoint/resume, periodic validation.

Equivalent of the reference's PyTorch-Lightning stack (``train.py`` +
``modules/detection.py`` + callbacks): here it is a plain loop around one
jitted train step — the TPU-idiomatic shape (no framework callbacks on the
hot path; everything that matters is inside the compiled step).

Checkpointing uses orbax (replaces W&B artifact upload/resume,
loggers/wandb_logger.py:77-87); metrics go to a JSONL metrics logger and
optionally TensorBoard (rvt_tpu/utils/logging.py).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from rvt_tpu.config import ExperimentConfig
from rvt_tpu.data.types import Batch
from rvt_tpu.models.backbone import zero_states
from rvt_tpu.models.detector import RVTDetector
from rvt_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                   shard_batch_arrays, shard_states)
from rvt_tpu.training.optimizer import make_optimizer
from rvt_tpu.training.step import init_train_state, make_train_step
from rvt_tpu.utils.checkpoint import CheckpointManager
from rvt_tpu.utils.logging import MetricsLogger


@dataclass
class TrainerConfig:
    max_steps: int = 400_000
    log_every_n_steps: int = 500
    ckpt_every_n_steps: int = 10_000
    val_every_n_steps: Optional[int] = None
    ckpt_dir: str = "checkpoints"
    monitor: str = "AP"  # checkpoint selection metric (val/AP, callbacks/custom.py:8-31)
    # per-parameter mean-|grad| logging cadence (reference GradFlowLogCallback,
    # callbacks/gradflow.py:10-51); 0 disables
    gradflow_every_n_steps: int = 5_000
    # input-pipeline lookahead; batches (incl. the host s2d stem transform)
    # are produced by a background thread so h5 decompression/augmentation
    # never sit on the step's critical path. 0 disables.
    prefetch_depth: int = 4
    # train-time detection metrics (reference
    # train_metrics_config.detection_metrics_every_n_steps,
    # modules/detection.py:199-205): every N steps, evaluate the Prophesee
    # COCO metric on training-batch predictions and log train/AP. The
    # reference postprocesses EVERY training batch; to keep NMS off the
    # hot path we only run the detection train-step variant on the
    # detection_metrics_n_batches steps leading up to each evaluation.
    # 0 disables.
    detection_metrics_every_n_steps: int = 0
    detection_metrics_n_batches: int = 4
    # pred-vs-GT panels from the training batch at every detection-metric
    # evaluation (reference DetectionVizCallback on train outputs,
    # callbacks/detection.py:32-100); None disables
    train_viz_dir: Optional[str] = None
    train_viz_max_panels: int = 4
    # checkpoint-artifact registry (reference W&B log_model=True,
    # wandb_logger.py:254-320): publish checkpoints to a shared-storage
    # registry directory with score metadata, best/last aliases, code
    # snapshot, and top-k retention. None disables.
    artifact_dir: Optional[str] = None
    artifact_name: str = "checkpoint"
    artifact_top_k: int = 1


class Trainer:
    def __init__(self, cfg: ExperimentConfig, trainer_cfg: TrainerConfig,
                 model: Optional[RVTDetector] = None, seed: int = 0,
                 dp_size: int = -1):
        self.cfg = cfg
        self.tcfg = trainer_cfg
        if model is None:
            # bf16 MXU compute when training.precision requests it (master
            # params stay f32; see rvt_tpu/utils/precision.py)
            compute = ("bfloat16" if cfg.training.precision in ("bf16", "bfloat16")
                       else "float32")
            model = RVTDetector(cfg=replace(cfg.model, compute_dtype=compute))
        self.model = model
        self.optimizer = make_optimizer(cfg.training)
        self.mesh = make_mesh(dp_size)
        self.state = init_train_state(self.model, cfg, self.optimizer,
                                      jax.random.PRNGKey(seed))
        self.state = replicate_tree(self.mesh, self.state)
        self.train_step = make_train_step(self.model, cfg, self.optimizer,
                                          mesh=self.mesh)
        # step variants (with_detections / with_param_metrics) compiled
        # lazily on their cadences; the hot step stays lean
        self._steps = {(False, False): self.train_step}
        self.ckpt = CheckpointManager(Path(trainer_cfg.ckpt_dir),
                                      monitor=trainer_cfg.monitor)
        self.artifacts = None
        if trainer_cfg.artifact_dir is not None:
            from rvt_tpu.parallel.multihost import is_main_process
            from rvt_tpu.utils.artifacts import ArtifactRegistry
            self.artifacts = ArtifactRegistry(trainer_cfg.artifact_dir)
            if is_main_process():
                # one code snapshot per run (reference save_code=True)
                self.artifacts.publish_code(
                    Path(__file__).resolve().parents[2],
                    name=f"{trainer_cfg.artifact_name}-code")
        self.logger = MetricsLogger(Path(trainer_cfg.ckpt_dir) / "metrics.jsonl")
        self._lstm_states = None
        # step counter tracked on host: fetching state.step every iteration
        # blocks dispatch (~27 ms RPC on the tunneled TPU vs a ~180 ms step)
        self._host_step = 0
        self._train_evaluator = None

    def _get_step(self, use_det: bool, use_pm: bool):
        key = (use_det, use_pm)
        if key not in self._steps:
            self._steps[key] = make_train_step(
                self.model, self.cfg, self.optimizer, mesh=self.mesh,
                with_detections=use_det, with_param_metrics=use_pm)
        return self._steps[key]

    # -- checkpoint/resume ----------------------------------------------------

    def restore(self, step: Optional[int] = None) -> bool:
        restored = self.ckpt.restore(self.state, step)
        if restored is None:
            return False
        self.state = replicate_tree(self.mesh, restored)
        self._host_step = int(jax.device_get(self.state.step))
        return True

    def load_weights(self, variables: Dict) -> None:
        """Weights-only init (reference resume_only_weights, train.py:79-89)."""
        self.state = self.state._replace(
            params=replicate_tree(self.mesh, variables["params"]),
            batch_stats=replicate_tree(self.mesh,
                                       variables.get("batch_stats", {})))

    def _publish_checkpoint(self, step: int,
                            metric: Optional[float]) -> None:
        """Push the just-written orbax step directory to the artifact
        registry: alias ``last`` always, ``best`` when this step is the
        best-manager's latest (reference _scan_and_log_checkpoints
        aliasing), then apply top-k retention."""
        src = self.ckpt.directory / "orbax" / str(step)
        if not src.exists():
            return
        aliases = ["last"]
        if self.ckpt.best_step() == step:
            aliases.append("best")
        name = self.tcfg.artifact_name
        self.artifacts.publish(
            src, name, score=metric, step=step, aliases=aliases,
            metadata={"monitor": self.tcfg.monitor,
                      "keep_top_k": self.tcfg.artifact_top_k})
        self.artifacts.prune(name, self.tcfg.artifact_top_k)

    def restore_from_artifact(self, uri: str) -> bool:
        """Resume from a published artifact (reference get_checkpoint,
        wandb_logger.py:77-87): resolve + md5-verify the payload, copy the
        orbax step dir back into this run's checkpoint tree, restore."""
        import shutil

        assert self.artifacts is not None, "TrainerConfig.artifact_dir unset"
        payload, manifest = self.artifacts.resolve(uri)
        step = int(manifest["step"] if manifest["step"] is not None
                   else payload.name)
        dst = self.ckpt.directory / "orbax" / str(step)
        if not dst.exists():
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copytree(payload, dst)
        return self.restore(step)

    # -- train-time detection metrics -----------------------------------------

    def _consume_train_detections(self, batch: Batch, det_out,
                                  evaluate: bool, step: int) -> None:
        """Feed one training batch's postprocessed predictions into a
        TRAIN-mode Prophesee evaluator; on ``evaluate`` steps score the
        buffer, log train/AP* and render pred-vs-GT panels.

        Mirrors modules/detection.py:199-205 (evaluator cadence) +
        callbacks/detection.py:32-100 (train viz)."""
        import numpy as np

        from rvt_tpu.evaluation.prophesee import PropheseeEvaluator
        from rvt_tpu.training.evaluator_loop import iter_batch_detections

        cfg = self.cfg
        if self._train_evaluator is None:
            self._train_evaluator = PropheseeEvaluator(
                cfg.dataset.name, cfg.dataset.downsample_by_factor_2)
        outputs = [np.asarray(o) for o in jax.device_get(det_out)]
        frames = list(iter_batch_detections(batch, *outputs))
        if frames:
            self._train_evaluator.add_labels([f[2] for f in frames])
            self._train_evaluator.add_predictions([f[3] for f in frames])
        if not evaluate:
            return
        from rvt_tpu.parallel.multihost import (is_main_process,
                                                merge_evaluator_buffers)
        merge_evaluator_buffers(self._train_evaluator)
        if self._train_evaluator.has_data():
            h, w = cfg.dataset.dataloading_hw
            m = self._train_evaluator.evaluate_buffer(img_height=h,
                                                      img_width=w)
            if m:
                self.logger.log(step, {f"train/{k}": v for k, v in m.items()})
        self._train_evaluator.reset_buffer()
        if self.tcfg.train_viz_dir is not None and is_main_process():
            self._write_train_panels(batch, frames, step)

    def _write_train_panels(self, batch: Batch, frames, step: int) -> None:
        from pathlib import Path

        import numpy as np

        from rvt_tpu.training.evaluator_loop import _write_panel
        from rvt_tpu.utils.visualization import (LABELMAP_GEN1,
                                                 LABELMAP_GEN4_SHORT)

        labelmap = (LABELMAP_GEN4_SHORT if self.cfg.dataset.name == "gen4"
                    else LABELMAP_GEN1)
        out_dir = Path(self.tcfg.train_viz_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, (b, t_step, gt, pred) in enumerate(
                frames[:self.tcfg.train_viz_max_panels]):
            ev = batch.ev_repr[b, t_step]
            if self.model.cfg.backbone.stem_s2d:
                # the prefetch transform already emitted s2d-blocked input;
                # invert it to recover the renderable storage-layout frame
                from rvt_tpu.ops.s2d import host_depth_to_space

                ev = host_depth_to_space(
                    ev, tuple(self.cfg.dataset.dataloading_hw),
                    self.model.cfg.backbone.input_channels)
            _write_panel(out_dir / f"step_{step:07d}_{i}.png",
                         np.asarray(ev), gt, pred, labelmap)

    # -- training loop ----------------------------------------------------------

    def fit(self, batches: Iterable[Batch],
            eval_fn: Optional[Callable[[Dict], Optional[Dict[str, float]]]] = None
            ) -> Dict[str, float]:
        """Run up to max_steps TBPTT windows. ``eval_fn(variables)`` is
        called every val_every_n_steps and must return metrics (incl. the
        monitored key) or None."""
        cfg = self.cfg
        last_metrics: Dict[str, float] = {}
        t_start = time.perf_counter()
        frames_done = 0

        stem_s2d = self.model.cfg.backbone.stem_s2d
        if stem_s2d:
            from dataclasses import replace as dc_replace

            from rvt_tpu.ops.s2d import host_space_to_depth

            in_res = self.model.cfg.backbone.in_res_hw

            def _transform(b: Batch) -> Batch:
                return dc_replace(b, ev_repr=host_space_to_depth(
                    b.ev_repr, in_res))
        else:
            _transform = None
        if self.tcfg.prefetch_depth > 0:
            from rvt_tpu.data.prefetch import PrefetchIterator

            batches = PrefetchIterator(batches, self.tcfg.prefetch_depth,
                                       transform=_transform)
        elif _transform is not None:
            batches = map(_transform, batches)

        K = cfg.dataset.max_labeled_frames
        for batch in batches:
            step_idx = self._host_step
            if step_idx >= self.tcfg.max_steps:
                break
            # gather_labeled_frames drops labelled frames beyond K; in
            # training that silently reduces supervision, so a label-
            # cadence/config mismatch fails loudly here instead.
            n_lab = int(batch.frame_valid.sum(axis=1).max())
            if n_lab > K:
                raise ValueError(
                    f"training window has {n_lab} labelled frames > "
                    f"max_labeled_frames={K}; raise "
                    "DatasetConfig.max_labeled_frames")
            if self._lstm_states is None:
                self._lstm_states = shard_states(
                    self.mesh, zero_states(cfg.model.backbone, batch.batch_size))

            ev, labels, label_mask, frame_valid, is_first = shard_batch_arrays(
                self.mesh, batch.ev_repr, batch.labels, batch.label_mask,
                batch.frame_valid, batch.is_first_sample)
            token_mask = None
            if batch.token_mask is not None:
                if not cfg.model.backbone.enable_masking:
                    raise ValueError(
                        "batch carries a token_mask but the model has "
                        "enable_masking=False")
                (token_mask,) = shard_batch_arrays(self.mesh,
                                                   batch.token_mask)
            elif cfg.model.backbone.enable_masking:
                # normalise to an all-False mask: a stream alternating
                # masked/unmasked batches would otherwise retrigger jit
                # tracing mid-run (None vs array are different pytree
                # structures)
                ps = cfg.model.backbone.stem_patch_size
                b_, t_, h_, w_ = batch.ev_repr.shape[:4]
                (token_mask,) = shard_batch_arrays(
                    self.mesh,
                    np.zeros((b_, t_, h_ // ps, w_ // ps), bool))
            det_every = self.tcfg.detection_metrics_every_n_steps
            use_det = False
            if det_every:
                r = (step_idx + 1) % det_every
                n_acc = max(1, self.tcfg.detection_metrics_n_batches)
                use_det = r == 0 or r > det_every - n_acc
            gf_every = self.tcfg.gradflow_every_n_steps
            use_pm = bool(gf_every) and (step_idx + 1) % gf_every == 0
            step_fn = self._get_step(use_det, use_pm)
            if use_det:
                self.state, self._lstm_states, metrics, det_out = step_fn(
                    self.state, self._lstm_states, ev, labels, label_mask,
                    frame_valid, is_first, token_mask)
                self._consume_train_detections(batch, det_out,
                                               evaluate=(r == 0),
                                               step=step_idx + 1)
            else:
                self.state, self._lstm_states, metrics = step_fn(
                    self.state, self._lstm_states, ev, labels, label_mask,
                    frame_valid, is_first, token_mask)
            frames_done += batch.batch_size * batch.seq_len
            self._host_step = step_idx + 1

            if (step_idx + 1) % self.tcfg.log_every_n_steps == 0:
                metrics = {k: v for k, v in metrics.items()
                           if use_pm or not k.startswith(("gradflow/",
                                                          "weights/"))}
                metrics = {k: float(v)
                           for k, v in jax.device_get(metrics).items()}
                dt = time.perf_counter() - t_start
                metrics["train/frames_per_s"] = frames_done / max(dt, 1e-9)
                last_metrics = metrics
                self.logger.log(step_idx + 1,
                                {f"train/{k}" if not k.startswith("train/")
                                 else k: v for k, v in metrics.items()})

            # only process 0 writes checkpoints (every process calling
            # orbax save on shared storage would collide; all processes
            # compute the identical val metric after the buffer merge, so
            # the retention decision is consistent anyway)
            from rvt_tpu.parallel.multihost import is_main_process
            is_main = is_main_process()
            if (step_idx + 1) % self.tcfg.ckpt_every_n_steps == 0 and is_main:
                self.ckpt.save(jax.device_get(self.state), step_idx + 1)
                if self.artifacts is not None:
                    self._publish_checkpoint(step_idx + 1, None)

            if (eval_fn is not None and self.tcfg.val_every_n_steps and
                    (step_idx + 1) % self.tcfg.val_every_n_steps == 0):
                variables = {"params": jax.device_get(self.state.params),
                             "batch_stats": jax.device_get(self.state.batch_stats)}
                val_metrics = eval_fn(variables)
                if val_metrics:
                    self.logger.log(step_idx + 1,
                                    {f"val/{k}": v for k, v in val_metrics.items()})
                    if is_main:
                        metric = val_metrics.get(self.tcfg.monitor)
                        self.ckpt.save(jax.device_get(self.state),
                                       step_idx + 1, metric=metric)
                        if self.artifacts is not None:
                            self._publish_checkpoint(step_idx + 1, metric)
        return last_metrics
