"""Build (and cache) the native host library `libdpqhost.so`.

The canonical build is CMake (see native/CMakeLists.txt); this module provides
the fast path used by tests and first import: a direct g++ invocation cached by
source digest, so `import duckdb_parquet_parser_tpu` works with zero setup.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SOURCES = [
    "dpq_common.hpp",
    "dpq_thrift.hpp",
    "dpq_meta.hpp",
    "dpq_reader.hpp",
    "dpq_prescan.hpp",
    "dpq_scan.hpp",
    "dpq_writer.hpp",
    "dpq_capi.cpp",
]

_lock = threading.Lock()
_cached_path: Path | None = None


def _digest() -> str:
    h = hashlib.sha256()
    for name in _SOURCES:
        h.update((_NATIVE_DIR / name).read_bytes())
    return h.hexdigest()[:16]


def build_library(force: bool = False, sanitize: bool = False) -> Path:
    """Compile libdpqhost.so if needed; returns the cached .so path."""
    global _cached_path
    with _lock:
        if _cached_path is not None and not force:
            return _cached_path
        cache_dir = Path(
            os.environ.get(
                "DPQ_BUILD_CACHE",
                os.path.join(
                    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                    "dpq_tpu",
                ),
            )
        )
        cache_dir.mkdir(parents=True, exist_ok=True)
        tag = _digest() + ("-asan" if sanitize else "")
        so_path = cache_dir / f"libdpqhost-{tag}.so"
        if not so_path.exists() or force:
            tmp = so_path.with_suffix(".so.tmp")
            cmd = [
                os.environ.get("CXX", "g++"),
                "-std=c++17",
                "-O3",
                "-fPIC",
                "-shared",
                "-pthread",
                "-Wall",
                "-Wextra",
                str(_NATIVE_DIR / "dpq_capi.cpp"),
                "-o",
                str(tmp),
            ]
            if sanitize:
                cmd[3:3] = ["-g", "-fsanitize=address,undefined"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            os.replace(tmp, so_path)
        _cached_path = so_path
        return so_path
