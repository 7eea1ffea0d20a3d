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


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(SOURCE), "-ljpeg", "-o", str(TARGET),
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    if verbose:
        print(f"built {TARGET}")
    return TARGET


if __name__ == "__main__":
    try:
        build()
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        print(f"native build failed (PIL fallback will be used): {exc}",
              file=sys.stderr)
        raise SystemExit(1)
