"""Remote artifact mirroring via fsspec (the reference's S3 analog).

The reference streams TensorBoard event files to S3 through a monkey-patched
RecordWriter with error-swallowing flush (logger.py:9-56) and uploads
checkpoints via boto3 BytesIO (parameter_manager.py:153-204). Here any
fsspec URI works (gs://, s3:// where s3fs is installed, memory:// in tests,
plain paths); failures are caught and printed, never fatal — the same
degrade-to-local contract the reference implements.
"""
from __future__ import annotations

import os
import time
from typing import Optional


def _fs_for(uri: str):
    import fsspec

    return fsspec.core.url_to_fs(uri)


def sync_dir(local_dir: str, remote_uri: str, verbose: bool = False) -> bool:
    """One-way mirror of ``local_dir`` to ``remote_uri`` (upload new/changed
    files by size). Returns True on full success; failures are swallowed."""
    try:
        fs, root = _fs_for(remote_uri)
        for dirpath, _, files in os.walk(local_dir):
            rel = os.path.relpath(dirpath, local_dir)
            for f in files:
                src = os.path.join(dirpath, f)
                dst = "/".join(
                    p for p in (root, "" if rel == "." else rel, f) if p
                )
                try:
                    if fs.exists(dst) and fs.size(dst) == os.path.getsize(src):
                        continue
                except Exception:
                    pass
                fs.put_file(src, dst)
                if verbose:
                    print(f"synced {src} -> {remote_uri.rstrip('/')}/{f}")
        return True
    except Exception as e:  # parity: reference swallows S3 errors (logger.py:25-29)
        print(f"remote sync to {remote_uri} failed (continuing local-only): {e}")
        return False


class RemoteMirror:
    """Rate-limited background-free mirror: call ``maybe_sync()`` at any
    cadence; uploads at most every ``interval_s`` seconds plus on ``close``."""

    def __init__(self, local_dir: str, remote_uri: Optional[str], interval_s: float = 60.0):
        self.local_dir = local_dir
        self.remote_uri = remote_uri
        self.interval_s = interval_s
        self._last = 0.0

    def maybe_sync(self) -> None:
        if not self.remote_uri:
            return
        now = time.time()
        if now - self._last >= self.interval_s:
            self._last = now
            sync_dir(self.local_dir, self.remote_uri)

    def close(self) -> None:
        if self.remote_uri:
            sync_dir(self.local_dir, self.remote_uri)
