"""Loader shim for the native IO extension (native/native_io.cpp).

`decode_pcd_file` / `FrameQueue` come from the C++ module when it is
built (``python native/setup.py build_ext --inplace`` from native/);
otherwise a pure-Python fallback (serialization.load_pcd + a
thread-based prefetcher) keeps the API available.
"""
from __future__ import annotations

import glob
import os
import queue
import sys
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE = None


def _build_native(native_dir: str) -> bool:
    """Best-effort in-place build of the extension on a fresh checkout.

    Build artifacts are not committed; compiling the single .cpp takes a
    few seconds, so do it once on first import instead of requiring a
    manual ``python native/setup.py build_ext --inplace`` step.  Set
    LOAM_NO_NATIVE_BUILD=1 to skip (the pure-Python fallback is used).
    """
    if os.environ.get("LOAM_NO_NATIVE_BUILD"):
        return False
    if not os.path.exists(os.path.join(native_dir, "setup.py")):
        return False
    import subprocess
    import warnings

    # Exclusive file lock: concurrent imports (multi-process tests, split
    # pytest runs) must not race two builds in the shared native/ dir —
    # a partially-linked .so would silently force the Python fallback.
    lock_path = os.path.join(native_dir, ".build.lock")
    try:
        lock_f = open(lock_path, "w")
    except OSError:
        return False
    try:
        import fcntl

        fcntl.flock(lock_f, fcntl.LOCK_EX)
        print("loam_livox_tpu: building native IO extension (one-time)...",
              file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=native_dir, capture_output=True, timeout=300)
        if proc.returncode != 0:
            tail = proc.stderr.decode(errors="replace").strip()[-400:]
            warnings.warn(
                "native IO extension build failed (pure-Python fallback "
                f"in use — IO will be slower): {tail}")
            return False
        return True
    except Exception as e:  # timeout, missing toolchain, ...
        warnings.warn(
            "native IO extension build failed (pure-Python fallback "
            f"in use — IO will be slower): {e!r}")
        return False
    finally:
        lock_f.close()


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    if native_dir not in sys.path:
        sys.path.insert(0, native_dir)
    try:
        import _native_io  # type: ignore

        _NATIVE = _native_io
    except ImportError:
        if _build_native(native_dir):
            try:
                import _native_io  # type: ignore

                _NATIVE = _native_io
            except ImportError:
                _NATIVE = False
        else:
            _NATIVE = False
    return _NATIVE


def have_native() -> bool:
    return bool(_load_native())


def decode_pcd_file(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    nat = _load_native()
    if nat:
        return nat.decode_pcd_file(path)
    from .serialization import load_pcd

    return load_pcd(path)


def decode_pcd(data: bytes) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    nat = _load_native()
    if nat:
        return nat.decode_pcd(data)
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pcd", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        from .serialization import load_pcd

        return load_pcd(p)
    finally:
        os.unlink(p)


class _PyFrameQueue:
    """Pure-Python fallback with the same drop-oldest semantics."""

    def __init__(self, files: List[str], capacity: int = 64):
        self._q: "queue.Queue" = queue.Queue()
        self._capacity = capacity
        self._dropped = 0
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._t = threading.Thread(target=self._run, args=(list(files),),
                                   daemon=True)
        self._t.start()

    def _run(self, files):
        for f in files:
            item = decode_pcd_file(f)
            with self._lock:
                if self._q.qsize() >= self._capacity:
                    try:
                        self._q.get_nowait()
                        self._dropped += 1
                    except queue.Empty:
                        pass
                self._q.put(item)
        self._done.set()

    def next_frame(self):
        while True:
            try:
                return self._q.get(timeout=0.05)
            except queue.Empty:
                if self._done.is_set() and self._q.empty():
                    return None

    def dropped(self) -> int:
        return self._dropped


def make_frame_queue(files: List[str], capacity: int = 64):
    """Threaded prefetch queue over PCD files (native when built)."""
    nat = _load_native()
    if nat:
        return nat.FrameQueue(files, capacity)
    return _PyFrameQueue(files, capacity)


def pcd_dir_stream(directory: str, capacity: int = 64):
    """Generator over a directory of frame-ordered .pcd files."""
    files = sorted(glob.glob(os.path.join(directory, "*.pcd")))
    q = make_frame_queue(files, capacity)
    while True:
        item = q.next_frame()
        if item is None:
            return
        yield item
