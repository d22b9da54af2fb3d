"""Build the native host extension (_libna_native.so) with g++.

Equivalent role to the reference's setup-time Cython builds and runtime nvcc
JIT (/root/reference/neural_admixture/setup.py:37-54,
/root/reference/neural_admixture/model/train.py:122-126): we compile once on
first use and cache the shared library next to the sources. Threading is
std::thread (-pthread), not OpenMP -- see bed_decode.cpp.
"""
import subprocess
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
SRC = _HERE / "bed_decode.cpp"
LIB = _HERE / "_libna_native.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cxx = sysconfig.get_config_var("CXX") or "g++"
    cxx = cxx.split()[0]
    # -march=x86-64-v3 (AVX2 baseline), not -march=native: the cached .so may
    # be baked into an image and run on a different host; -native binaries
    # SIGILL on older CPUs. Falls back for non-x86 or very old compilers.
    for march in ("-march=x86-64-v3", "-march=native"):
        cmd = [cxx, "-O3", march, "-pthread", "-std=c++17", "-shared",
               "-fPIC", str(SRC), "-o", str(LIB)]
        res = subprocess.run(cmd, capture_output=True)
        if res.returncode == 0:
            return LIB
    res.check_returncode()
    return LIB


if __name__ == "__main__":
    print(build(force=True))
