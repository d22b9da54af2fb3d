"""Build glue: compile the native host extension into the wheel.

The reference builds its Cython/OpenMP extensions at install time
(/root/reference/neural_admixture/setup.py:37-54) and releases manylinux
wheels through cibuildwheel. Here the native decoder is a plain g++ shared
library loaded via ctypes (no Python C API), compiled BEST-EFFORT at wheel
build time: if the build host has no C++ toolchain the wheel still works --
neural_admixture_tpu.native.build compiles on first use, and pure-NumPy
fallbacks cover hosts with no compiler at all (native/bed_native.py).
"""
import pathlib
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        try:
            sys.path.insert(0, str(pathlib.Path(__file__).parent))
            from neural_admixture_tpu.native.build import build
            # Portable ISA: the wheel may run on machines older than the
            # build host; hosts with a toolchain rebuild tuned on first
            # load failure (bed_native._load), hosts without keep this one.
            lib = build(force=True, portable=True)
            print(f"built native extension: {lib}")
        except Exception as exc:  # toolchain-free host: wheel stays pure
            print(f"warning: native extension not built ({exc}); the "
                  "package will compile it on first use or fall back to "
                  "NumPy decoders.")
        finally:
            sys.path.pop(0)
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
