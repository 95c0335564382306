"""Filesystem checkpoint-artifact registry.

TPU-native replacement for the reference's W&B model-artifact flow
(``loggers/wandb_logger.py``): checkpoint upload with score metadata and
``best``/``last`` aliases (``_scan_and_log_checkpoints``, :254-320),
top-k retention that never deletes aliased artifacts (``_rm_but_top_k``,
:322-376), resume by artifact name (``get_checkpoint``, :77-87), and the
run's code snapshot (``save_code=True``, :64).

Instead of a vendor registry, artifacts live under a plain directory
tree — point ``root`` at local disk for single-host runs or at shared
storage (NFS / GCS-fuse mount) for fleets; every write is atomic
(tmp + rename) so concurrent readers never observe partial artifacts.

Layout::

    <root>/<name>/v<N>/manifest.json   # score/step/metadata + file md5s
    <root>/<name>/v<N>/payload/...     # the checkpoint file or orbax dir
    <root>/<name>/aliases.json         # {"best": 3, "last": 7}

URIs: ``<name>``, ``<name>@best``, ``<name>@last``, ``<name>@v3``.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _md5(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _file_manifest(payload: Path) -> Dict[str, str]:
    if payload.is_file():
        return {payload.name: _md5(payload)}
    out = {}
    for p in sorted(payload.rglob("*")):
        if p.is_file():
            out[str(p.relative_to(payload))] = _md5(p)
    return out


class ArtifactRegistry:
    def __init__(self, root: str | Path):
        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)

    # -- write side ---------------------------------------------------------

    def publish(self, src: str | Path, name: str, *,
                score: Optional[float] = None, step: Optional[int] = None,
                aliases: Sequence[str] = (),
                metadata: Optional[Dict[str, Any]] = None) -> str:
        """Copy a checkpoint file or directory into the registry as the
        next version of ``name``; returns ``"<name>@v<N>"``.

        Mirrors one artifact log of ``_scan_and_log_checkpoints``: the
        manifest records score/step/metadata (the reference stashes
        score + ModelCheckpoint config in artifact.metadata) plus per-file
        md5s so a resume can verify integrity end-to-end.
        """
        src = Path(src)
        if not src.exists():
            raise FileNotFoundError(src)
        adir = self.root / name
        adir.mkdir(parents=True, exist_ok=True)
        version = max(self._version_numbers(name), default=0) + 1
        vdir = adir / f"v{version}"
        tmp = adir / f".tmp-v{version}-{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        payload = tmp / "payload"
        payload.mkdir(parents=True)
        if src.is_file():
            shutil.copy2(src, payload / src.name)
        else:
            shutil.copytree(src, payload / src.name)
        manifest = {
            "name": name,
            "version": version,
            "score": None if score is None else float(score),
            "step": step,
            "metadata": metadata or {},
            "original_filename": src.name,
            "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "files": _file_manifest(payload / src.name),
        }
        (tmp / "manifest.json").write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, vdir)  # atomic publish
        for alias in aliases:
            self.set_alias(name, alias, version)
        return f"{name}@v{version}"

    def set_alias(self, name: str, alias: str, version: int) -> None:
        adir = self.root / name
        path = adir / "aliases.json"
        aliases = json.loads(path.read_text()) if path.exists() else {}
        aliases[alias] = version
        tmp = adir / f".aliases-{os.getpid()}.tmp"
        tmp.write_text(json.dumps(aliases, indent=1))
        os.replace(tmp, path)

    def prune(self, name: str, keep_top_k: int) -> List[int]:
        """Delete versions beyond the ``keep_top_k`` best-scored ones,
        never deleting an aliased version (reference ``_rm_but_top_k``:
        last and best are exempt; ``keep_top_k == -1`` keeps everything).
        Returns the deleted version numbers."""
        if keep_top_k < 0:
            return []
        keep = set(self.aliases(name).values())
        scored = [(m.get("score"), m["version"]) for m in self.versions(name)]
        ranked = sorted((s, v) for s, v in scored if s is not None)
        ranked.reverse()  # best first
        keep.update(v for _, v in ranked[:keep_top_k])
        deleted = []
        for s, v in scored:
            if v not in keep:
                shutil.rmtree(self.root / name / f"v{v}")
                deleted.append(v)
        return deleted

    def publish_code(self, repo_root: str | Path, name: str = "code",
                     patterns: Sequence[str] = ("*.py", "*.cpp", "*.h",
                                                "Makefile")) -> str:
        """Snapshot the source tree as a tar.gz artifact (the reference's
        ``save_code=True``). Only files matching ``patterns`` under
        ``repo_root`` are included."""
        repo_root = Path(repo_root)
        tmp = self.root / f".code-{os.getpid()}.tar.gz"
        with tarfile.open(tmp, "w:gz") as tar:
            for pat in patterns:
                for p in sorted(repo_root.rglob(pat)):
                    if p.is_file() and ".git" not in p.parts:
                        tar.add(p, arcname=str(p.relative_to(repo_root)))
        try:
            return self.publish(tmp, name, metadata={"repo_root":
                                                     str(repo_root)})
        finally:
            tmp.unlink(missing_ok=True)

    # -- read side ----------------------------------------------------------

    def _version_numbers(self, name: str) -> List[int]:
        adir = self.root / name
        if not adir.is_dir():
            return []
        return [int(p.name[1:]) for p in adir.iterdir()
                if p.name.startswith("v") and p.name[1:].isdigit()
                and (p / "manifest.json").exists()]

    def versions(self, name: str) -> List[Dict[str, Any]]:
        out = []
        for v in sorted(self._version_numbers(name)):
            out.append(json.loads(
                (self.root / name / f"v{v}" / "manifest.json").read_text()))
        return out

    def aliases(self, name: str) -> Dict[str, int]:
        path = self.root / name / "aliases.json"
        return json.loads(path.read_text()) if path.exists() else {}

    def resolve(self, uri: str, *, verify: bool = True
                ) -> Tuple[Path, Dict[str, Any]]:
        """``"<name>[@best|@last|@v<N>]"`` -> (payload path, manifest).
        Bare names resolve through the ``last`` alias, else the newest
        version (reference ``get_checkpoint`` downloads the artifact and
        returns the single file inside). With ``verify`` the payload md5s
        are re-checked against the manifest."""
        name, _, sel = uri.partition("@")
        if not self._version_numbers(name):
            raise FileNotFoundError(f"no artifact named {name!r} under "
                                    f"{self.root}")
        if sel.startswith("v") and sel[1:].isdigit():
            version = int(sel[1:])
        elif sel:
            aliases = self.aliases(name)
            if sel not in aliases:
                raise KeyError(f"artifact {name!r} has no alias {sel!r} "
                               f"(have {sorted(aliases)})")
            version = aliases[sel]
        else:
            version = self.aliases(name).get(
                "last", max(self._version_numbers(name)))
        vdir = self.root / name / f"v{version}"
        manifest = json.loads((vdir / "manifest.json").read_text())
        payload = vdir / "payload" / manifest["original_filename"]
        if verify:
            got = _file_manifest(payload)
            if got != manifest["files"]:
                bad = {k for k in set(got) | set(manifest["files"])
                       if got.get(k) != manifest["files"].get(k)}
                raise IOError(f"artifact {name}@v{version} failed md5 "
                              f"verification: {sorted(bad)[:5]}")
        return payload, manifest
