"""Staging for file-source streams.

Spark's FileStreamSource only accepts a directory; the fixtures are single
parquet files, so streams read a symlink-holding staging directory instead.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def stage_single_file_dir(src: str, prefix: str) -> str:
    """Stage ``src`` behind a per-user staging directory and return the dir.

    Per-user (uid in the path): a fixed world-shared tempdir owned by another
    user on a multi-user host would fail ``makedirs``/``symlink`` with
    PermissionError. A stale link whose target no longer resolves (fixture
    regenerated or deleted) is recreated instead of silently yielding an
    empty stream.
    """
    uid = os.getuid() if hasattr(os, "getuid") else 0
    stage = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_u{uid}_" + hashlib.sha1(src.encode()).hexdigest()[:12],
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, os.path.basename(src))
    try:
        os.symlink(src, link)
    except FileExistsError:
        # Recreate when the existing link is dangling or points elsewhere;
        # concurrent sessions racing to the same (equivalent) link are fine.
        if not os.path.exists(link) or os.path.realpath(link) != os.path.realpath(src):
            os.unlink(link)
            try:
                os.symlink(src, link)
            except FileExistsError:
                # a concurrent session won the unlink->symlink race; its
                # link is equivalent (same deterministic target)
                pass
    return stage
