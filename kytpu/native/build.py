"""Build the native film encoder: `python -m kytpu.native.build`."""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
SRC = HERE / "film_io.cpp"
LIB = HERE / "libkyfilm.so"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(SRC), "-o", str(LIB)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
    print(f"built {LIB}", file=sys.stderr)
