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
    cmd = [cxx, "-O3", "-march=native", "-pthread", "-std=c++17", "-shared",
           "-fPIC", str(SRC), "-o", str(LIB)]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
