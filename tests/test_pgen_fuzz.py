"""Adversarial fuzzing of the standard-mode PGEN decoders.

The mode-0x10/0x11 decoder is spec-derived and (in this environment)
cannot be cross-validated against pgenlib, so its safety margin is
structural: both decode paths -- pure Python (io/pgen_standard.py) and
C++ (native/bed_decode.cpp na_pgen_decode2) -- must, on corrupted
input, either decode IDENTICALLY or reject CLEANLY (ValueError /
NotImplementedError / FileNotFoundError), never crash, and must AGREE
on accept-vs-reject. >= 1000 mutants per run: random bit flips, byte
scrambles, truncations, extensions, and targeted index/record-length
corruptions, over fixtures exercising every record type.

Header bytes 3-10 (variant/sample counts) are excluded from mutation:
corrupting the claimed dimensions is a different threat (loudly echoed
garbage dims) and makes the expected output undefined rather than
testing parse robustness.
"""
import numpy as np
import pytest

from neural_admixture_tpu.io import pgen_standard
from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                   write_pgen_standard)

try:
    from neural_admixture_tpu.native import bed_native
    HAVE_NATIVE = bed_native.pgen_available()
except ImportError:
    HAVE_NATIVE = False

REJECT = (ValueError, NotImplementedError, FileNotFoundError)
# Mutating the header control byte can redirect parsing so that a vint
# runs 100+ MB through the record area; both paths handle it, but the
# pure-Python path does so very slowly. Keep fixtures small.
DIMS = (29, 60)


def _fixture(tmp_path, seed=5, **kw):
    N, M = DIMS
    rng = np.random.default_rng(seed)
    G = np.zeros((N, M), np.uint8)
    for v in range(M):
        kind = v % 7
        if kind == 0:
            G[:, v] = rng.integers(0, 4, N)
        elif kind == 1:
            G[rng.choice(N, 3, replace=False), v] = rng.integers(1, 4, 3)
        elif kind == 2:
            G[:, v] = rng.choice([0, 2], N)
            G[rng.choice(N, 2, replace=False), v] = rng.integers(1, 4, 2)
        elif kind == 3:
            G[:, v] = G[:, v - 1]
            G[rng.choice(N, 2, replace=False), v] = rng.integers(0, 4, 2)
        elif kind == 4:
            G[:, v] = np.array([2, 1, 0, 3], np.uint8)[G[:, v - 1]]
        elif kind == 5:
            G[:, v] = 2
            G[rng.choice(N, 2, replace=False), v] = rng.integers(0, 2, 2)
        else:
            G[:, v] = 3
            G[rng.choice(N, 2, replace=False), v] = rng.integers(0, 3, 2)
    path = str(tmp_path / "fix.pgen")
    write_pgen_standard(path, G, psam=False, **kw)
    return path, G


def _decode_pure(path, n_read):
    """(outcome, payload): pure-Python path only."""
    try:
        r = StandardPgen(path)
        # force the pure path by bypassing read_block's native branch
        out = np.empty((n_read, r.N), np.uint8)
        with open(r.path, "rb") as fh:
            for v in range(n_read):
                out[v] = r._decode_one(fh, v)
        return ("ok", out.tobytes())
    except REJECT:
        return ("reject", None)


def _decode_native(path, n_read):
    try:
        r = StandardPgen(path)
        out = r._read_block_native(bed_native, 0, n_read)
        return ("ok", out.tobytes())
    except REJECT:
        return ("reject", None)


def _check_agreement(path, n_read):
    pure = _decode_pure(path, n_read)
    if not HAVE_NATIVE:
        return pure
    nat = _decode_native(path, n_read)
    assert nat[0] == pure[0], \
        f"native={nat[0]} pure={pure[0]} must agree on accept-vs-reject"
    if pure[0] == "ok":
        assert nat[1] == pure[1], "accepted decodes must be identical"
    return pure


def _mutate(rng, raw, kind):
    """One corrupted copy of ``raw``; header dim bytes 3..10 protected."""
    raw = bytearray(raw)
    protected = set(range(3, 11))
    if kind == 0:  # flip 1-8 random bits
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(raw)))
            if i in protected:
                continue
            raw[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1:  # truncate at a random point (past the header)
        cut = int(rng.integers(12, len(raw)))
        del raw[cut:]
    elif kind == 2:  # scramble a random byte range
        i = int(rng.integers(11, len(raw)))
        j = min(len(raw), i + int(rng.integers(1, 32)))
        for k in range(i, j):
            if k not in protected:
                raw[k] = int(rng.integers(0, 256))
    elif kind == 3:  # append junk
        raw += bytes(rng.integers(0, 256, int(rng.integers(1, 64)),
                                  dtype=np.uint8))
    else:  # targeted: corrupt one record-length byte in the index
        n_blocks = 1
        idx0 = 12 + 8 * n_blocks
        i = int(rng.integers(idx0, min(len(raw), idx0 + 4 * DIMS[1])))
        raw[i] = int(rng.integers(0, 256))
    return bytes(raw)


@pytest.mark.parametrize("fixture_kw", [
    {},                            # 8-bit vrtypes (default)
    {"idx_enc": 0},                # 4-bit vrtypes
    {"nonref_code": 3},            # index carries a nonref bitarray
    {"fixed_width": True},         # storage code 8 (no index at all)
    {"fixed_width": True, "mode": 0x11},   # storage 8 + separate .pgi
])
def test_fuzz_decoders_agree_and_never_crash(tmp_path, fixture_kw):
    import os
    import shutil

    path, G = _fixture(tmp_path, **fixture_kw)
    raw = open(path, "rb").read()
    n_read = DIMS[1]

    # the unmutated fixture must decode correctly through both paths
    outcome = _check_agreement(path, n_read)
    assert outcome[0] == "ok"
    assert outcome[1] == np.ascontiguousarray(G.T).tobytes()

    rng = np.random.default_rng(1234)
    mut_path = str(tmp_path / "mut.pgen")
    if os.path.exists(path + ".pgi"):   # 0x11: records mutate, index intact
        shutil.copy(path + ".pgi", mut_path + ".pgi")
    n_ok = n_reject = 0
    for trial in range(400):
        mut = _mutate(rng, raw, trial % 5)
        with open(mut_path, "wb") as fh:
            fh.write(mut)
        out = _check_agreement(mut_path, n_read)
        if out[0] == "ok":
            n_ok += 1
        else:
            n_reject += 1
    # the mutation engine must actually produce both outcomes
    assert n_reject > 50, (n_ok, n_reject)
    assert n_ok > 5, (n_ok, n_reject)  # some flips are benign (aux bits...)


def test_fuzz_mode_0x11_index(tmp_path):
    """Mode 0x11: mutate the companion .pgi (the index is the riskiest
    surface) while the records stay intact, and vice versa."""
    path, G = _fixture(tmp_path, mode=0x11)
    pgi = path + ".pgi"
    raw_pgen = open(path, "rb").read()
    raw_pgi = open(pgi, "rb").read()
    n_read = DIMS[1]
    assert _check_agreement(path, n_read)[0] == "ok"

    rng = np.random.default_rng(7)
    n_reject = 0
    for trial in range(200):
        if trial % 2:
            open(pgi, "wb").write(_mutate(rng, raw_pgi, trial % 5))
            open(path, "wb").write(raw_pgen)
        else:
            open(pgi, "wb").write(raw_pgi)
            open(path, "wb").write(_mutate(rng, raw_pgen, trial % 4))
        if _check_agreement(path, n_read)[0] == "reject":
            n_reject += 1
    assert n_reject > 25


def test_wrapping_difflist_deltas_reject_cleanly(tmp_path):
    """Hand-crafted int64-wrapping difflist: four 2^62 deltas sum to 2^64,
    so the running sample-id cumsum wraps back to the start id with every
    PAIRWISE diff positive (int64 subtraction wraps back to the positive
    delta) and the FINAL id in bounds. A decoder that only checks the
    last id + diffs accepts this and then crashes (IndexError on the
    fancy-indexed assignment in Python; int64-overflow UB in C++).
    Both paths must instead reject it as a clean ValueError and agree."""
    N, M = 100, 1
    vint_2_62 = b"\x80" * 8 + b"\x40"   # LEB128 of 1 << 62
    rec = bytes([5])                    # difflist length L = 5
    rec += bytes([0])                   # group-start sample id 0 (1 byte)
    rec += bytes([0b01010101, 0b00000001])  # ceil(5/4) raregeno bytes
    rec += vint_2_62 * 4                # deltas: cumsum wraps to 0
    path = str(tmp_path / "wrap.pgen")
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x10")
        fh.write(np.asarray([M], "<u4").tobytes())
        fh.write(np.asarray([N], "<u4").tobytes())
        fh.write(bytes([0x04]))         # 8-bit vrtypes, 1-byte lengths
        fh.write(np.asarray([12 + 8 + 1 + 1], "<u8").tobytes())
        fh.write(bytes([4]))            # vrtype 4: difflist vs all-hom-ref
        fh.write(bytes([len(rec)]))
        fh.write(rec)
    assert _decode_pure(path, M)[0] == "reject"
    assert _check_agreement(path, M)[0] == "reject"
