"""Named session registry: list / delete / export / import + caps.

The reference keeps saved sessions in a file-backed store with a
max-session count and a per-session size cap
(`/root/reference/internal/storage/sessions/store.go:22-30`:
DefaultMaxSessions=50, DefaultMaxSessionSize=1 GiB), name validation
(`pkg/models/session.go:26-39`: lowercase alphanumeric + hyphens, <=128
chars), conflict-on-existing unless forced
(`internal/api/sessions.go:150-156`), and export/import as a single
portable file (`internal/api/sessions.go:468-530`).

This module layers those registry semantics over the existing snapshot
format (`sessions.save_session` parquet dirs with binary HLL columns —
the mergeable representation). Each named session is

    <root>/<name>/data/*.parquet   the snapshot (mergeable)
    <root>/<name>/meta.json        metadata (description, created, counts)

Writes are crash-safe the same way `streaming.compact_state` is: data and
metadata land in a staging directory and ONE atomic rename publishes them
(a crash leaves either the old session or none, never a torn one).
Export bundles the directory into a single gzip tar so sessions move
between hosts as one artifact, mirroring the reference's .json.gz export.
"""

from __future__ import annotations

import json
import re
import shutil
import tarfile
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAX_SESSIONS = 50  # store.go:27
DEFAULT_MAX_SESSION_BYTES = 1024 * 1024 * 1024  # store.go:26 (1 GiB)
_NAME_RE = re.compile(r"^[a-z0-9][a-z0-9-]*$")


class SessionStoreError(Exception):
    pass


class InvalidSessionNameError(SessionStoreError):
    pass


class SessionExistsError(SessionStoreError):
    pass


class SessionNotFoundError(SessionStoreError):
    pass


class TooManySessionsError(SessionStoreError):
    pass


class SessionTooLargeError(SessionStoreError):
    pass


def validate_session_name(name: str) -> None:
    """Reference name rules (`session.go:26-39`): non-empty, <=128 chars,
    lowercase alphanumeric + hyphens."""
    if not name or len(name) > 128 or not _NAME_RE.match(name):
        raise InvalidSessionNameError(
            f"invalid session name {name!r}: lowercase alphanumeric and "
            "hyphens only, max 128 chars"
        )


def _dir_bytes(path: Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


class SessionStore:
    """File-backed named session registry with the reference's caps."""

    def __init__(
        self,
        root: str,
        max_sessions: int = DEFAULT_MAX_SESSIONS,
        max_session_bytes: int = DEFAULT_MAX_SESSION_BYTES,
    ) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_sessions = max_sessions
        self.max_session_bytes = max_session_bytes

    # -- paths ----------------------------------------------------------
    def _session_dir(self, name: str) -> Path:
        validate_session_name(name)
        return self.root / name

    def exists(self, name: str) -> bool:
        return (self._session_dir(name) / "meta.json").exists()

    # -- write path -----------------------------------------------------
    def save(
        self,
        snapshot: DataFrame,
        name: str,
        description: str = "",
        force: bool = False,
    ) -> dict:
        """Persist a snapshot under `name`. Conflict unless ``force``
        (`sessions.go:150-156`); refuses new names at the session cap
        (`store.go:103-105` checks the cap only for NEW sessions —
        overwrites are always allowed); refuses snapshots above the size
        cap AFTER staging, before publish (`store.go:119-122`)."""
        sdir = self._session_dir(name)
        exists = self.exists(name)
        if exists and not force:
            raise SessionExistsError(
                f"session {name!r} already exists (use force to overwrite)"
            )
        if not exists and len(self.list()) >= self.max_sessions:
            raise TooManySessionsError(
                f"maximum number of sessions reached ({self.max_sessions})"
            )
        staging = self.root / f".staging-{name}"
        if staging.exists():
            shutil.rmtree(staging)
        snapshot.write.mode("overwrite").parquet(str(staging / "data"))
        size = _dir_bytes(staging)
        if size > self.max_session_bytes:
            shutil.rmtree(staging)
            raise SessionTooLargeError(
                f"session data too large: {size} > {self.max_session_bytes}"
            )
        n_keys = snapshot.sparkSession.read.parquet(
            str(staging / "data")
        ).count()
        meta = {
            "id": name,
            "description": description,
            "created": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_keys": n_keys,
            "size_bytes": size,
            "version": 1,
        }
        (staging / "meta.json").write_text(json.dumps(meta))
        old = self.root / f".old-{name}"
        if old.exists():
            shutil.rmtree(old)
        if sdir.exists():
            sdir.rename(old)  # keep the previous version until publish
        staging.rename(sdir)  # the ONE atomic publish
        shutil.rmtree(old, ignore_errors=True)
        return meta

    # -- read path ------------------------------------------------------
    def load(self, spark: SparkSession, name: str) -> DataFrame:
        sdir = self._session_dir(name)
        if not self.exists(name):
            raise SessionNotFoundError(f"session {name!r} not found")
        return spark.read.parquet(str(sdir / "data"))

    def metadata(self, name: str) -> dict:
        sdir = self._session_dir(name)
        if not self.exists(name):
            raise SessionNotFoundError(f"session {name!r} not found")
        return json.loads((sdir / "meta.json").read_text())

    def list(self) -> list[dict]:
        """All session metadata, newest first (`store.go:188-194`)."""
        metas = []
        for meta_file in self.root.glob("*/meta.json"):
            # glob matches dot-dirs too: .staging-*/.old-* are unpublished
            # transients from a crashed or in-flight save — never sessions
            if meta_file.parent.name.startswith("."):
                continue
            try:
                metas.append(json.loads(meta_file.read_text()))
            except (OSError, json.JSONDecodeError):  # torn write: skip
                continue
        return sorted(metas, key=lambda m: m["created"], reverse=True)

    def delete(self, name: str) -> None:
        sdir = self._session_dir(name)
        if not self.exists(name):
            raise SessionNotFoundError(f"session {name!r} not found")
        shutil.rmtree(sdir)

    # -- portability ----------------------------------------------------
    def export_session(self, name: str, dest: str) -> str:
        """Bundle a session into one portable gzip tar
        (`sessions.go:468-495`'s .json.gz download analogue)."""
        sdir = self._session_dir(name)
        if not self.exists(name):
            raise SessionNotFoundError(f"session {name!r} not found")
        dest_path = Path(dest)
        dest_path.parent.mkdir(parents=True, exist_ok=True)
        with tarfile.open(dest_path, "w:gz") as tar:
            tar.add(sdir, arcname=name)
        return str(dest_path)

    def import_session(
        self, src: str, name: str | None = None, force: bool = False
    ) -> dict:
        """Install an exported bundle, optionally under a new name
        (`sessions.go:497-530`). Same conflict/cap rules as save."""
        with tarfile.open(src, "r:gz") as tar:
            members = tar.getmembers()
            top = {m.name.split("/", 1)[0] for m in members}
            if len(top) != 1:
                raise SessionStoreError(
                    f"bundle must contain exactly one session, got {sorted(top)}"
                )
            orig = top.pop()
            target = name or orig
            validate_session_name(target)
            if self.exists(target) and not force:
                raise SessionExistsError(
                    f"session {target!r} already exists (use force to overwrite)"
                )
            if not self.exists(target) and len(self.list()) >= self.max_sessions:
                raise TooManySessionsError(
                    f"maximum number of sessions reached ({self.max_sessions})"
                )
            staging = self.root / f".staging-{target}"
            if staging.exists():
                shutil.rmtree(staging)
            staging.mkdir(parents=True)
            tar.extractall(staging, filter="data")
        try:
            extracted = staging / orig
            size = _dir_bytes(extracted)
            if size > self.max_session_bytes:  # same cap as save (store.go:119)
                raise SessionTooLargeError(
                    f"session data too large: {size} > {self.max_session_bytes}"
                )
            meta = json.loads((extracted / "meta.json").read_text())
            meta["id"] = target
            meta["size_bytes"] = size
            (extracted / "meta.json").write_text(json.dumps(meta))
            sdir = self.root / target
            old = self.root / f".old-{target}"
            if old.exists():
                shutil.rmtree(old)
            if sdir.exists():
                sdir.rename(old)
            extracted.rename(sdir)
            shutil.rmtree(old, ignore_errors=True)
            return meta
        finally:
            # a malformed bundle (missing/corrupt meta.json, size-cap hit)
            # must not leave the staging dir behind; on success only the
            # empty staging shell remains after the rename
            shutil.rmtree(staging, ignore_errors=True)
