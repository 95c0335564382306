"""Checkpoint-artifact registry (rvt_tpu/utils/artifacts.py): the
filesystem replacement for the reference's W&B model artifacts
(loggers/wandb_logger.py): versioned publish + aliases + md5 verify +
top-k retention + resume, and the trainer integration."""
import json
import tarfile

import numpy as np
import pytest

from rvt_tpu.utils.artifacts import ArtifactRegistry


def test_publish_resolve_roundtrip(tmp_path):
    reg = ArtifactRegistry(tmp_path / "reg")
    src = tmp_path / "model.ckpt"
    src.write_bytes(b"weights-v1")

    uri = reg.publish(src, "ckpt", score=0.31, step=100, aliases=["last"])
    assert uri == "ckpt@v1"
    payload, manifest = reg.resolve("ckpt@v1")
    assert payload.read_bytes() == b"weights-v1"
    assert manifest["score"] == pytest.approx(0.31)
    assert manifest["step"] == 100

    # second version becomes 'last'; alias + bare-name resolution follow it
    src.write_bytes(b"weights-v2")
    reg.publish(src, "ckpt", score=0.35, step=200,
                aliases=["last", "best"])
    for uri in ("ckpt@last", "ckpt@best", "ckpt"):
        payload, manifest = reg.resolve(uri)
        assert payload.read_bytes() == b"weights-v2", uri
        assert manifest["version"] == 2
    # explicit old version still reachable
    assert reg.resolve("ckpt@v1")[0].read_bytes() == b"weights-v1"

    with pytest.raises(KeyError):
        reg.resolve("ckpt@nope")
    with pytest.raises(FileNotFoundError):
        reg.resolve("other")


def test_publish_directory_and_md5_verify(tmp_path):
    reg = ArtifactRegistry(tmp_path / "reg")
    src = tmp_path / "step_10"
    (src / "sub").mkdir(parents=True)
    (src / "a.bin").write_bytes(b"aaa")
    (src / "sub" / "b.bin").write_bytes(b"bbb")
    reg.publish(src, "ckpt", step=10, aliases=["last"])

    payload, manifest = reg.resolve("ckpt")
    assert sorted(manifest["files"]) == ["a.bin", "sub/b.bin"]
    assert (payload / "sub" / "b.bin").read_bytes() == b"bbb"

    # corrupt a payload file -> verification must fail loudly
    (payload / "a.bin").write_bytes(b"evil")
    with pytest.raises(IOError, match="md5"):
        reg.resolve("ckpt")
    # but verify=False still resolves (escape hatch)
    assert reg.resolve("ckpt", verify=False)[1]["step"] == 10


def test_prune_keeps_topk_and_aliased(tmp_path):
    """Retention mirrors the reference _rm_but_top_k: top-k by score
    survive, aliased versions are never deleted, unscored versions go."""
    reg = ArtifactRegistry(tmp_path / "reg")
    src = tmp_path / "m.ckpt"
    scores = [0.10, 0.30, None, 0.20, 0.25]
    for i, s in enumerate(scores):
        src.write_bytes(f"w{i}".encode())
        reg.publish(src, "ckpt", score=s, step=i,
                    aliases=["last"] + (["best"] if s == 0.30 else []))
    # keep top-2 by score: v2 (0.30, best) + v5 (0.25); v4 is 'last';
    # v1 (0.10) and the unscored v3 are deleted... but v5 IS last.
    # aliases now: best -> v2, last -> v5
    deleted = reg.prune("ckpt", keep_top_k=2)
    assert sorted(deleted) == [1, 3, 4]
    left = [m["version"] for m in reg.versions("ckpt")]
    assert left == [2, 5]
    assert reg.resolve("ckpt@best")[1]["version"] == 2
    assert reg.resolve("ckpt@last")[1]["version"] == 5
    # keep_top_k=-1 keeps everything
    assert reg.prune("ckpt", keep_top_k=-1) == []


def test_publish_code_snapshot(tmp_path):
    reg = ArtifactRegistry(tmp_path / "reg")
    repo = tmp_path / "repo"
    (repo / "pkg").mkdir(parents=True)
    (repo / "pkg" / "mod.py").write_text("x = 1\n")
    (repo / "native.cpp").write_text("int main(){}\n")
    (repo / "data.bin").write_bytes(b"\x00" * 10)  # not matched
    reg.publish_code(repo, name="code")
    payload, _ = reg.resolve("code")
    with tarfile.open(payload) as tar:
        names = sorted(tar.getnames())
    assert names == ["native.cpp", "pkg/mod.py"]


def test_trainer_publish_and_restore_from_artifact(tmp_path):
    """End-to-end: a trainer with artifact_dir publishes its orbax
    checkpoints (code snapshot at init, last alias), and a FRESH trainer
    restores bit-identical state from the registry alone (reference
    get_checkpoint resume, wandb_logger.py:77-87)."""
    import jax

    from rvt_tpu.config import preset
    from rvt_tpu.training.trainer import Trainer, TrainerConfig

    cfg = preset("gen1", "tiny", resolution_hw=(32, 32), sequence_length=2,
                 max_labels_per_frame=4, max_labeled_frames=2)
    reg_dir = tmp_path / "registry"
    tcfg = TrainerConfig(max_steps=2, log_every_n_steps=1,
                         ckpt_every_n_steps=2, ckpt_dir=str(tmp_path / "a"),
                         artifact_dir=str(reg_dir), artifact_top_k=1)
    trainer = Trainer(cfg, tcfg, dp_size=1)
    from tests.test_trainer import _batches
    trainer.fit(_batches(cfg, 3))

    reg = ArtifactRegistry(reg_dir)
    # code snapshot at init + the step-2 checkpoint publish
    assert reg.versions("checkpoint-code")
    vs = reg.versions("checkpoint")
    assert [m["step"] for m in vs] == [2]
    assert reg.aliases("checkpoint")["last"] == vs[0]["version"]

    # fresh trainer, fresh ckpt_dir: restore purely from the registry
    tcfg2 = TrainerConfig(max_steps=2, ckpt_dir=str(tmp_path / "b"),
                          artifact_dir=str(reg_dir))
    trainer2 = Trainer(cfg, tcfg2, dp_size=1)
    assert trainer2.restore_from_artifact("checkpoint@last")
    assert int(jax.device_get(trainer2.state.step)) == 2
    p1 = jax.device_get(trainer.state.params)
    p2 = jax.device_get(trainer2.state.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
