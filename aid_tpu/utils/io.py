"""Small I/O utilities: cached URL fetch + stdout tee logger.

Capability parity with the reference dnnlib helpers: ``open_url`` (cached
download, utils/dnnlib/util.py:395+ — used to pull released checkpoints) and
``Logger`` (stdout/stderr tee to file, util.py:55-111).
"""
from __future__ import annotations

import hashlib
import os
import sys
import urllib.request
from typing import Optional


def open_url(url: str, cache_dir: Optional[str] = None, timeout: float = 60.0):
    """Fetch a URL with on-disk caching; returns an open binary file object.

    Mirrors the reference's dnnlib.util.open_url capability (checkpoint
    download). In egress-less environments this raises URLError — callers
    should point at local paths instead.
    """
    if os.path.exists(url):           # local path passthrough
        return open(url, "rb")
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "aid_tpu", "downloads")
    os.makedirs(cache_dir, exist_ok=True)
    tag = hashlib.md5(url.encode()).hexdigest()[:16]
    name = os.path.basename(url.split("?")[0]) or "download"
    path = os.path.join(cache_dir, f"{tag}-{name}")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, path)
    return open(path, "rb")


class Logger:
    """Tee stdout (and optionally stderr) to a file (reference Logger
    semantics: file_mode append, auto-flush)."""

    def __init__(self, file_name: Optional[str] = None, file_mode: str = "a",
                 should_flush: bool = True):
        self.file = open(file_name, file_mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        sys.stdout = self

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        self.flush()
        if sys.stdout is self:
            sys.stdout = self.stdout
        if self.file is not None:
            self.file.close()
            self.file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
