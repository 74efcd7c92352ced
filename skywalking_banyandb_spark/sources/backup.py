"""Backup / restore of the segment layout — the ``banyand/backup`` analogue.

The reference backs a snapshot up into a time-named directory
(``backup.go:249-257`` getTimeDir: daily ``YYYY-MM-DD`` / hourly
``YYYY-MM-DD-HH``) on a remote FS, skipping files already present
(``backupSnapshot``: incremental by name), and restores by replacing local
data with the chosen time-dir's content (``restore.go``; time-dir listing
``timedir.go``).

Spark-native mapping: a resource's data IS its segment directory tree
(``ts_bucket=`` parquet), already immutable-once-written, so backup is a
directory copy that skips files whose (name, size) already exist in the
target — incremental, restartable, and O(changed files). Restore swaps the
restored tree in atomically (temp dir + rename), the same pattern the write
path uses for CRUD. On object storage both become manifest/copy operations;
nothing here rewrites rows.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional


def _time_dir(now, style: str = "daily") -> str:
    if style == "hourly":
        return now.strftime("%Y-%m-%d-%H")
    return now.strftime("%Y-%m-%d")


def backup(path: str, backup_root: str, now, style: str = "daily") -> str:
    """Incremental copy of the segment tree into ``backup_root/<timedir>/``.

    Files already present with the same size are skipped (the reference's
    existing-remote-file set, ``backup.go:259-280``). Returns the time-dir
    name."""
    tdir = _time_dir(now, style)
    dest_root = os.path.join(backup_root, tdir)
    copied = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        rel = os.path.relpath(dirpath, path)
        dest_dir = os.path.join(dest_root, rel) if rel != "." else dest_root
        os.makedirs(dest_dir, exist_ok=True)
        for f in filenames:
            src = os.path.join(dirpath, f)
            dst = os.path.join(dest_dir, f)
            if os.path.exists(dst) and os.path.getsize(dst) == os.path.getsize(src):
                continue  # already backed up (incremental skip)
            shutil.copy2(src, dst)
            copied += 1
    return tdir


def list_backups(backup_root: str) -> List[str]:
    """Available time-dirs, oldest first (``timedir.go`` list command)."""
    if not os.path.isdir(backup_root):
        return []
    return sorted(
        d for d in os.listdir(backup_root)
        if os.path.isdir(os.path.join(backup_root, d))
    )


def restore(backup_root: str, path: str, time_dir: Optional[str] = None) -> str:
    """Replace ``path`` with the chosen (default: latest) snapshot.

    Atomic swap: restore into a sibling temp dir, then rename — readers
    never observe a half-restored tree (``restore.go`` deletes orphans /
    rebuilds local state; the swap is the single-node equivalent)."""
    dirs = list_backups(backup_root)
    if not dirs:
        raise FileNotFoundError(f"no backups under {backup_root!r}")
    tdir = time_dir or dirs[-1]
    if tdir not in dirs:
        raise FileNotFoundError(f"backup {tdir!r} not found under {backup_root!r}")
    src = os.path.join(backup_root, tdir)
    tmp = path.rstrip("/") + ".restore-tmp"
    old = path.rstrip("/") + ".restore-old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    # Swap via rename-aside so a live tree exists at every instant: a crash
    # after the first rename leaves the restored tree one rename away (tmp),
    # never a window with no data directory (same pattern as the write
    # path's _atomic_replace).
    if os.path.exists(old):
        shutil.rmtree(old)
    had_live = os.path.exists(path)
    if had_live:
        os.rename(path, old)
    os.rename(tmp, path)
    if had_live:
        shutil.rmtree(old)
    return tdir
