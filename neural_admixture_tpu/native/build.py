"""Build the native host extension (_libna_native.so) with g++.

Equivalent role to the reference's setup-time Cython builds and runtime nvcc
JIT (/root/reference/neural_admixture/setup.py:37-54,
/root/reference/neural_admixture/model/train.py:122-126): we compile once on
first use and cache the shared library next to the sources. Threading is
std::thread (-pthread), not OpenMP -- see bed_decode.cpp.
"""
import platform
import subprocess
import sysconfig
from pathlib import Path

_HERE = Path(__file__).parent
SRC = _HERE / "bed_decode.cpp"
LIB = _HERE / "_libna_native.so"


def _march_flags():
    """Portable-first -march candidates the BUILD HOST can actually run.

    Compilation with -march=x86-64-v3 succeeds on any x86 host (the
    compiler never checks the CPU), so host support must be read from
    /proc/cpuinfo: a v3 binary built on a pre-AVX2 host would SIGILL on
    first use. Portable levels are preferred over -march=native because
    the cached .so may be baked into an image and run elsewhere.
    """
    if platform.machine() not in ("x86_64", "AMD64"):
        return ["-march=native", ""]
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    if "avx2" in flags:
        return ["-march=x86-64-v3", "-march=native", ""]
    if "sse4_2" in flags:
        return ["-march=x86-64-v2", "-march=native", ""]
    return ["-march=native", ""]


def build(force: bool = False, portable: bool = False) -> Path:
    """``portable=True`` (wheel builds, setup.py): no -march at all -- the
    binary must run on ANY machine of the wheel's platform, not just hosts
    matching the build runner's ISA level (an AVX2-tuned .so SIGILLs on an
    older x86-64). First-use builds keep the host-tuned candidates; a
    shipped .so that fails to load is rebuilt for the running host
    (native/bed_native._load)."""
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cxx = sysconfig.get_config_var("CXX") or "g++"
    cxx = cxx.split()[0]
    res = None
    # Compile to a per-process temp name and os.replace() it into place:
    # concurrent first-use builds (e.g. the 2-process CLI tests on a fresh
    # checkout) would otherwise race on the single output path and one
    # process could dlopen a half-written .so.
    import os
    tmp = LIB.with_suffix(f".tmp{os.getpid()}.so")
    for march in ([""] if portable else _march_flags()):
        cmd = [cxx, "-O3", "-pthread", "-std=c++17", "-shared", "-fPIC",
               str(SRC), "-o", str(tmp)]
        if march:
            cmd.insert(2, march)
        res = subprocess.run(cmd, capture_output=True)
        if res.returncode == 0:
            os.replace(tmp, LIB)
            return LIB
    tmp.unlink(missing_ok=True)
    raise RuntimeError(
        f"native build failed ({' '.join(cmd)}):\n"
        f"{res.stderr.decode(errors='replace')}")


if __name__ == "__main__":
    print(build(force=True))
