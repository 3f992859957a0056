"""Build the native crop/resize shared library with g++.

Usage: python -m vima_tpu.native.build
"""

from __future__ import annotations

import pathlib
import subprocess
import sys


def build(verbose: bool = True) -> pathlib.Path:
    here = pathlib.Path(__file__).parent
    src = here / "crop_resize.cpp"
    out = here / "libcrop_resize.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
