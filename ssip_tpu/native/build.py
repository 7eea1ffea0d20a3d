"""Build the native decoder: ``python -m ssip_tpu.native.build``.

Compiles decode.cpp against the system libjpeg into
``ssip_tpu/native/libssipdecode.so``. Everything degrades to the PIL path if
this was never run or the toolchain/library is missing.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SOURCE = HERE / "decode.cpp"
TARGET = HERE / "libssipdecode.so"


def build(verbose: bool = True, sanitize: str | None = None) -> Path:
    """Compile the decoder; ``sanitize`` ∈ {None, "address", "thread"}.

    Sanitizer builds (ASan/TSan) are the test configuration for the native
    component (SURVEY.md §5.2) — run the decoder test suite against them:
    ``python -m ssip_tpu.native.build --sanitize address && pytest
    tests/test_native_decoder.py``.
    """
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(SOURCE), "-ljpeg", "-o", str(TARGET),
    ]
    if sanitize:
        cmd[1:1] = [f"-fsanitize={sanitize}", "-g", "-fno-omit-frame-pointer"]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    if verbose:
        print(f"built {TARGET}")
    return TARGET


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sanitize", choices=["address", "thread"], default=None)
    args = parser.parse_args()
    try:
        build(sanitize=args.sanitize)
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"native build failed (PIL fallback will be used): {exc}",
              file=sys.stderr)
        raise SystemExit(1)
