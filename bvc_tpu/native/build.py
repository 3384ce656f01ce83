"""Build the native decode core: ``python bvc_tpu/native/build.py``.

Produces ``libbvc_native.so`` next to this file.  Requires g++ and
libjpeg headers (both baked into the image).  The Python wrapper
(:mod:`bvc_tpu.native`) falls back to the pure-Python decode path when
the library is absent, so building is optional.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def build(verbose: bool = True) -> Path:
    src = HERE / "decode.cpp"
    out = HERE / "libbvc_native.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), "-ljpeg", "-pthread",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
