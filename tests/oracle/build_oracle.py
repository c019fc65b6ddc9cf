"""Builds the reference parity oracle (`dump`) from the read-only reference
sources.  Test-harness use only — no reference code enters the framework."""

from __future__ import annotations

import hashlib
import os
import subprocess
from pathlib import Path

REF = Path(os.environ.get("DPQ_REFERENCE", "/root/reference"))
HERE = Path(__file__).resolve().parent

_REF_SOURCES = [
    "src/reader/thrift.cpp",
    "src/reader/metadata.cpp",
    "src/reader/column_info.cpp",
    "src/reader/column_reader.cpp",
    "src/reader/parquet_reader.cpp",
    "src/writer/thrift_writer.cpp",
    "src/writer/parquet_writer.cpp",
]


def build_oracle() -> Path | None:
    """Compile the oracle binary; returns None when the reference is absent."""
    if not (REF / "include").is_dir():
        return None
    h = hashlib.sha256((HERE / "dump_main.cpp").read_bytes())
    for s in _REF_SOURCES:
        h.update((REF / s).read_bytes())
    out = Path("/tmp/dpq_oracle") / f"dump-{h.hexdigest()[:16]}"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = (
        ["g++", "-std=c++17", "-O2", "-I", str(REF / "include"), str(HERE / "dump_main.cpp")]
        + [str(REF / s) for s in _REF_SOURCES]
        + ["-o", str(out) + ".tmp"]
    )
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(str(out) + ".tmp", out)
    return out


def run_oracle(*args: str) -> str:
    exe = build_oracle()
    assert exe is not None, "reference sources unavailable"
    res = subprocess.run([str(exe), *args], check=True, capture_output=True)
    return res.stdout.decode("utf-8", "surrogateescape")


if __name__ == "__main__":
    print(build_oracle())
