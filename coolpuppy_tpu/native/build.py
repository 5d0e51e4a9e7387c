"""Build the native ingest shared library: python -m coolpuppy_tpu.native.build"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "_ingest.cpp")
OUT = os.path.join(HERE, "_ingest.so")


def build(verbose=True):
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-fopenmp",
        SRC,
        "-o",
        OUT,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}", file=sys.stderr)
