"""Build hooks for pixo-tpu.

The native host tier (pixo_tpu/native/core.cpp) is a plain shared
library loaded via ctypes — not a CPython extension — so it is compiled
here with g++ directly (the same command as `make native`).  The build
is best-effort: the package is fully functional without the .so (the
pure-Python/JAX paths are the equality oracles for the native tier), so
a missing compiler degrades gracefully instead of failing the install.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

PKG = Path(__file__).resolve().parent / "pixo_tpu" / "native"

NATIVE_CMD = [
    "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
    "-fno-exceptions", "-fvisibility=hidden", "-Wall", "-pthread",
    # -ffp-contract=off is load-bearing: GCC otherwise fuses the AAN
    # DCT's intrinsic mul+add pairs into FMAs and breaks bit-parity with
    # the reference encoder (see NOTES.md round-3).
    "-ffp-contract=off",
    str(PKG / "core.cpp"), "-o", str(PKG / "libpixo_core.so"),
]


class BuildPyWithNative(build_py):
    def run(self):
        try:
            subprocess.run(NATIVE_CMD, check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(
                f"warning: native tier build failed ({e}); "
                "pixo-tpu will run on the pure-Python/JAX paths",
                file=sys.stderr,
            )
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
