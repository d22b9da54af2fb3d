"""PGEN reader tests: pure-Python fixed-width modes, the pgenlib-backed
block reader (against a fake pgenlib), and the streaming packed path."""
import sys
import types

import numpy as np
import pytest

from neural_admixture_tpu.io import pgen as pgen_mod
from neural_admixture_tpu.io.packed import pack_with_padding, unpack_2bit_rows
from neural_admixture_tpu.io.pgen import (read_pgen, read_pgen_packed,
                                          write_pgen_mode2)


def _geno(N=37, M=210, seed=0, missing=True, flip=False):
    rng = np.random.default_rng(seed)
    if flip:  # mean >= 1 triggers the minor-allele flip
        G = rng.choice([1, 2, 2, 0], size=(N, M)).astype(np.uint8)
    else:
        G = rng.choice([0, 0, 1, 2], size=(N, M)).astype(np.uint8)
    if missing:
        G[rng.uniform(size=G.shape) < 0.05] = 3
    G[0, 0] = 0  # pin validation: min == 0
    G[1, 1] = 2  # and max >= 2
    return G


def test_mode2_roundtrip(tmp_path):
    G = _geno()
    path = str(tmp_path / "toy.pgen")
    write_pgen_mode2(path, G)
    got = read_pgen(path)
    np.testing.assert_array_equal(got, G)


def test_mode1_bed_body(tmp_path):
    """Mode 0x01: the payload is a PLINK1 .bed body; N comes from .psam."""
    G = _geno(N=21, M=50)
    N, M = G.shape
    # dosage -> BED 2-bit code: 0->0b11, 1->0b10, 2->0b00, 3->0b01
    code = np.array([3, 2, 0, 1], dtype=np.uint8)[G.T]  # (M, N)
    n4 = -(-N // 4) * 4
    cv = np.zeros((M, n4), dtype=np.uint8)
    cv[:, :N] = code
    c4 = cv.reshape(M, n4 // 4, 4)
    body = (c4[:, :, 0] | (c4[:, :, 1] << 2)
            | (c4[:, :, 2] << 4) | (c4[:, :, 3] << 6)).astype(np.uint8)
    path = tmp_path / "toy1.pgen"
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x01" + body.tobytes())
    with open(tmp_path / "toy1.psam", "w") as fh:
        fh.write("#IID\n" + "\n".join(f"s{i}" for i in range(N)) + "\n")
    np.testing.assert_array_equal(read_pgen(str(path)), G)


def test_unsupported_mode_raises(tmp_path):
    path = tmp_path / "toy.pgen"
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x20" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="pgenlib"):
        read_pgen(str(path))


def test_bad_magic_raises(tmp_path):
    path = tmp_path / "toy.pgen"
    path.write_bytes(b"\x00\x00\x02" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        read_pgen(str(path))


def test_pgenlib_block_reader_with_fake_module(tmp_path, monkeypatch):
    """The pgenlib-backed path: read_range fills int8 blocks with -9 for
    missing hardcalls; our reader must map them to 3 and transpose."""
    G = _geno(N=11, M=40)

    class FakePgenReader:
        def __init__(self, path_bytes):
            assert isinstance(path_bytes, bytes)

        def get_variant_ct(self):
            return G.shape[1]

        def get_raw_sample_ct(self):
            return G.shape[0]

        def read_range(self, v0, v1, out):
            block = G.T[v0:v1].astype(np.int8)
            block[block == 3] = -9
            out[:] = block

    fake = types.ModuleType("pgenlib")
    fake.PgenReader = FakePgenReader
    monkeypatch.setitem(sys.modules, "pgenlib", fake)
    monkeypatch.setattr(pgen_mod, "_BLOCK_VARIANTS", 16)  # force >1 block

    got = read_pgen(str(tmp_path / "whatever.pgen"))
    np.testing.assert_array_equal(got, G)


@pytest.mark.parametrize("flip", [False, True])
def test_read_pgen_packed_matches_dense(tmp_path, flip, monkeypatch):
    """Streaming-to-packed equals dense-read + normalize + pack."""
    monkeypatch.setattr(pgen_mod, "_BLOCK_VARIANTS", 64)
    G = _geno(N=19, M=333, flip=flip)
    path = str(tmp_path / "toy.pgen")
    write_pgen_mode2(path, G)

    packed, N, M = read_pgen_packed(path)
    assert (N, M) == G.shape

    Gn = G.copy()
    if Gn.mean() >= 1:
        miss = Gn == 3
        Gn = (2 - Gn.astype(np.int16)).astype(np.uint8)
        Gn[miss] = 3
    expected, m_pad = pack_with_padding(Gn)
    np.testing.assert_array_equal(packed, expected)
    # and the padding columns are zero dosages
    tail = unpack_2bit_rows(packed, m_pad)[:, M:]
    assert (tail == 0).all()


def test_snp_reader_dispatches_pgen(tmp_path):
    from neural_admixture_tpu.io.snp_reader import SNPReader
    G = _geno(N=12, M=64, missing=False)
    path = str(tmp_path / "toy.pgen")
    write_pgen_mode2(path, G)
    got = SNPReader().read_data(path)
    assert got.shape == G.shape
    assert got.min() == 0 and got.max() in (2, 3)


def test_train_cli_on_pgen(tmp_path):
    """End-to-end: train on a PGEN fileset through the packed-native path."""
    from neural_admixture_tpu.entry import main as cli_main
    rng = np.random.default_rng(3)
    G = rng.choice([0, 1, 2], p=[0.6, 0.3, 0.1], size=(40, 120)) \
        .astype(np.uint8)
    path = str(tmp_path / "train.pgen")
    write_pgen_mode2(path, G)
    out = str(tmp_path / "out")
    rc = cli_main(["train", "--k", "3", "--data_path", path,
                   "--save_dir", out, "--name", "pg", "--epochs", "2",
                   "--batch_size", "16", "--hidden_size", "16",
                   "--no_progress"])
    assert rc == 0
    Q = np.genfromtxt(f"{out}/pg.3.Q")
    P = np.genfromtxt(f"{out}/pg.3.P")
    assert Q.shape == (40, 3) and P.shape == (120, 3)
    np.testing.assert_allclose(Q.sum(axis=1), 1.0, atol=1e-4)


# ----------------- standard (compressed) mode 0x10 --------------------------


def _geno_mode16(N=53, M=300, seed=5):
    """Genotypes engineered so the cheapest-representation writer picks
    every supported record type: dense-random (plain 0), mostly-hom-ref
    (difflist 4), mostly-hom-alt (difflist 6), mostly-missing (difflist
    7), two-common-values (onebit 1), near-copies of the previous variant
    (LD 2) and near-inverted copies (LD-inverted 3)."""
    rng = np.random.default_rng(seed)
    G = np.zeros((N, M), np.uint8)
    for v in range(M):
        kind = v % 7
        if kind == 0:
            G[:, v] = rng.integers(0, 4, N)
        elif kind == 1:  # sparse vs hom-ref: a few non-ref
            idx = rng.choice(N, size=3, replace=False)
            G[idx, v] = rng.integers(1, 4, 3)
        elif kind == 2:  # onebit: two common values + rare exceptions
            G[:, v] = rng.choice([0, 2], N)
            G[rng.choice(N, 2, replace=False), v] = rng.integers(1, 4, 2)
        elif kind == 3:  # LD: copy previous with a few diffs
            G[:, v] = G[:, v - 1]
            idx = rng.choice(N, size=2, replace=False)
            G[idx, v] = rng.integers(0, 4, 2)
        elif kind == 4:  # inverted LD
            inv = np.array([2, 1, 0, 3], np.uint8)
            G[:, v] = inv[G[:, v - 1]]
            G[rng.choice(N, 2, replace=False), v] = rng.integers(0, 4, 2)
        elif kind == 5:  # sparse vs hom-alt
            G[:, v] = 2
            idx = rng.choice(N, size=2, replace=False)
            G[idx, v] = rng.integers(0, 2, 2)
        else:  # sparse vs missing
            G[:, v] = 3
            idx = rng.choice(N, size=2, replace=False)
            G[idx, v] = rng.integers(0, 3, 2)
    G[0, 0] = 0
    G[1, 1] = 2
    return G


@pytest.mark.parametrize("idx_enc", [0, 4, 5])
def test_standard_mode_roundtrip(tmp_path, idx_enc):
    """Writer/reader pair must be bit-exact across every record type and
    index encoding (4-bit and 8-bit vrtypes, 1- and 2-byte lengths)."""
    from neural_admixture_tpu.io.pgen_standard import write_pgen_standard
    G = _geno_mode16()
    path = str(tmp_path / "std.pgen")
    vrtypes = write_pgen_standard(path, G, idx_enc=idx_enc)
    # the workload must actually exercise compressed representations
    assert {0, 1, 4, 6, 7} <= set(vrtypes), sorted(set(vrtypes))
    assert {2, 3} & set(vrtypes), sorted(set(vrtypes))
    np.testing.assert_array_equal(read_pgen(path), G)


def test_standard_mode_multiblock(tmp_path, monkeypatch):
    """> 1 variant block: per-block index offsets + LD-chain reset."""
    from neural_admixture_tpu.io import pgen_standard
    monkeypatch.setattr(pgen_standard, "VBLOCK", 64)
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno_mode16(N=29, M=200, seed=7)
    path = str(tmp_path / "mb.pgen")
    write_pgen_standard(path, G)
    r = StandardPgen(path)
    assert (r.N, r.M) == G.shape
    np.testing.assert_array_equal(r.read_block(0, r.M).T, G)


def test_standard_mode_random_access(tmp_path):
    """read_block from mid-file must rewind through LD chains to the
    nearest non-LD base and still decode exactly."""
    from neural_admixture_tpu.io.pgen_standard import StandardPgen
    from neural_admixture_tpu.io.pgen_standard import write_pgen_standard
    G = _geno_mode16(N=41, M=250, seed=9)
    path = str(tmp_path / "ra.pgen")
    vrtypes = write_pgen_standard(path, G)
    r = StandardPgen(path)
    # pick a start that lands ON an LD-compressed variant
    ld = [v for v in range(100, 200) if (vrtypes[v] & 7) in (2, 3)]
    v0 = ld[0]
    np.testing.assert_array_equal(r.read_block(v0, v0 + 40).T,
                                  G[:, v0:v0 + 40])
    # and backwards (forces a second rewind)
    np.testing.assert_array_equal(r.read_block(10, 30).T, G[:, 10:30])


def test_standard_mode_packed_and_rows(tmp_path, monkeypatch):
    """The biobank packed path and the multi-host row-block path work on
    mode-0x10 inputs like on fixed-width ones."""
    from neural_admixture_tpu.io.pgen import read_pgen_packed_rows
    from neural_admixture_tpu.io.pgen_standard import write_pgen_standard
    monkeypatch.setattr(pgen_mod, "_BLOCK_VARIANTS", 64)
    G = _geno_mode16(N=23, M=170, seed=11)
    path = str(tmp_path / "pk.pgen")
    write_pgen_standard(path, G)

    packed, N, M = read_pgen_packed(path)
    assert (N, M) == G.shape
    Gn = G.copy()
    if Gn.mean() >= 1:
        miss = Gn == 3
        Gn = (2 - Gn.astype(np.int16)).astype(np.uint8)
        Gn[miss] = 3
    expected, _ = pack_with_padding(Gn)
    np.testing.assert_array_equal(packed, expected)

    rows, counts = read_pgen_packed_rows(path, 5, 17)
    exp_rows, _ = pack_with_padding(G[5:17])
    np.testing.assert_array_equal(rows, exp_rows)
    np.testing.assert_array_equal(
        counts, np.bincount(G[5:17].ravel(), minlength=4))


def test_standard_mode_native_matches_pure(tmp_path, monkeypatch):
    """The C++ record decoder (native/bed_decode.cpp na_pgen_decode2) must
    be bit-identical to the pure-Python reference path, including LD-state
    reuse across sequential calls and random-access rewinds."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    from neural_admixture_tpu.native import bed_native
    if not bed_native.pgen_available():
        pytest.skip("native library unavailable")
    G = _geno_mode16(N=47, M=260, seed=13)
    path = str(tmp_path / "nat.pgen")
    write_pgen_standard(path, G)

    r_nat = StandardPgen(path)
    blocks_nat = [r_nat.read_block(v0, min(v0 + 64, 260))
                  for v0 in range(0, 260, 64)]
    ra_nat = r_nat.read_block(77, 150)  # random access (rewind)

    monkeypatch.setattr(bed_native, "pgen_available", lambda: False)
    r_pure = StandardPgen(path)
    for v0, blk in zip(range(0, 260, 64), blocks_nat):
        np.testing.assert_array_equal(
            blk, r_pure.read_block(v0, min(v0 + 64, 260)))
    np.testing.assert_array_equal(ra_nat, r_pure.read_block(77, 150))
    np.testing.assert_array_equal(blocks_nat[0].T[:, :64], G[:, :64])


@pytest.mark.parametrize("N", [255, 256, 257, 700, 1500])
def test_standard_mode_wide_samples(tmp_path, N):
    """Edge geometry the small fixtures miss: sample counts spanning the
    1-to-2-byte sample-id boundary, difflists longer than one 64-entry
    group, and id deltas >= 128 (multi-byte LEB128 vints). Exercises both
    the native and pure decoders (the native path runs when built; the
    A/B test above pins them identical)."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    rng = np.random.default_rng(N)
    M = 40
    G = np.zeros((N, M), np.uint8)
    for v in range(M):
        if v % 3 == 0:  # long sparse difflist: ~N/3 exceptions, >64 entries
            idx = rng.choice(N, size=max(65, N // 3), replace=False)
            G[idx, v] = rng.integers(1, 4, idx.size)
        elif v % 3 == 1:  # very sparse: few exceptions with huge id deltas
            idx = np.sort(rng.choice(N, size=3, replace=False))
            G[idx, v] = rng.integers(1, 4, 3)
        else:  # dense
            G[:, v] = rng.integers(0, 4, N)
    path = str(tmp_path / f"wide{N}.pgen")
    vrtypes = write_pgen_standard(path, G)
    assert 4 in {t & 7 for t in vrtypes}
    r = StandardPgen(path)
    np.testing.assert_array_equal(r.read_block(0, M).T, G)
    np.testing.assert_array_equal(r.read_block(7, 23).T, G[:, 7:23])


def test_standard_mode_ignores_aux_track_bytes(tmp_path):
    """8-bit vrtypes may flag phase/dosage tracks in their high bits; the
    extra track bytes are appended INSIDE the record (covered by its
    length). A hardcalls-only reader must decode the main genotype track
    and skip the rest -- rewrite a fixture's records with high vrtype bits
    + trailing junk bytes and require identical decodes from both the
    pure and native paths."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno_mode16(N=33, M=60, seed=17)
    path = str(tmp_path / "aux.pgen")
    write_pgen_standard(path, G)  # idx_enc=4: 8-bit vrtypes, 1-byte lens
    raw = bytearray(open(path, "rb").read())
    M_, N_ = 60, 33
    # header: 12 B; offsets: 1 block -> 8 B; index: 60 vrtypes + 60 lens
    idx0 = 12 + 8
    vrt = raw[idx0:idx0 + M_]
    lens = raw[idx0 + M_:idx0 + 2 * M_]
    rec0 = idx0 + 2 * M_
    out = bytearray(raw[:rec0])
    pos = rec0
    new_vrt, new_lens = bytearray(), bytearray()
    for v in range(M_):
        rec = raw[pos:pos + lens[v]]
        pos += lens[v]
        extra = b"\xAB" * (v % 3)  # fake aux-track bytes
        new_vrt.append(vrt[v] | 0x30)  # set high "track" bits
        assert lens[v] + len(extra) < 256
        new_lens.append(lens[v] + len(extra))
        out += rec + extra
    out[idx0:idx0 + M_] = new_vrt
    out[idx0 + M_:idx0 + 2 * M_] = new_lens
    aux_path = str(tmp_path / "aux2.pgen")
    open(aux_path, "wb").write(bytes(out))

    r = StandardPgen(aux_path)
    np.testing.assert_array_equal(r.read_block(0, M_).T, G)
    try:
        from neural_admixture_tpu.native import bed_native
        if bed_native.pgen_available():
            r2 = StandardPgen(aux_path)
            np.testing.assert_array_equal(r2.read_block(0, M_).T, G)
    except ImportError:
        pass


def test_standard_mode_rejects_unknown_format(tmp_path):
    """Storage codes 9-15 (fixed-width dosage layouts) are not supported
    and must raise the install-pgenlib error, not misdecode."""
    from neural_admixture_tpu.io.pgen_standard import StandardPgen
    path = tmp_path / "bad.pgen"
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x10")
        fh.write(np.asarray([1], "<u4").tobytes())
        fh.write(np.asarray([4], "<u4").tobytes())
        fh.write(bytes([0x09]))  # storage code 9: fixed-width dosage
    with pytest.raises(NotImplementedError, match="pgenlib"):
        StandardPgen(str(path))


def test_standard_mode_rejects_truncated_fixed(tmp_path):
    """Storage code 8 (plain fixed-width) is supported, but a file whose
    records run past EOF must fail loudly."""
    from neural_admixture_tpu.io.pgen_standard import StandardPgen
    path = tmp_path / "trunc.pgen"
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x10")
        fh.write(np.asarray([1], "<u4").tobytes())
        fh.write(np.asarray([4], "<u4").tobytes())
        fh.write(bytes([0x88]))  # storage 8, nonref code 2 (no bitarray)
    with pytest.raises(ValueError, match="truncated"):
        StandardPgen(str(path))


def test_standard_mode_fixed_width_storage8(tmp_path):
    """Header storage code 8: every record is a plain 2-bit hardcall and
    no offset array or per-block index exists."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno(N=17, M=90, seed=2)
    path = str(tmp_path / "fixed.pgen")
    vrtypes = write_pgen_standard(path, G, fixed_width=True)
    assert set(vrtypes) == {0}
    # 12-byte header + M * ceil(N/4) records and nothing else
    assert (tmp_path / "fixed.pgen").stat().st_size == 12 + 90 * 5
    r = StandardPgen(path)
    assert (r.N, r.M) == G.shape
    np.testing.assert_array_equal(r.read_block(0, r.M).T, G)
    np.testing.assert_array_equal(read_pgen(path), G)


def test_standard_mode_fixed_width_0x11(tmp_path):
    """Storage code 8 under the mode-0x11 split layout: the 12-byte .pgi
    IS the whole index, so the variant-count sanity check must bound M by
    the RECORD file, not the index file (an M > 24 fixed-width 0x11 file
    was falsely rejected as 'impossible for a 12-byte file')."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno(N=17, M=90, seed=2)   # M far beyond 2 * 12-byte index
    path = str(tmp_path / "fixed11.pgen")
    write_pgen_standard(path, G, fixed_width=True, mode=0x11)
    assert (tmp_path / "fixed11.pgen.pgi").stat().st_size == 12
    assert (tmp_path / "fixed11.pgen").stat().st_size == 3 + 90 * 5
    r = StandardPgen(path)
    assert r.mode == 0x11 and (r.N, r.M) == G.shape
    np.testing.assert_array_equal(r.read_block(0, r.M).T, G)
    np.testing.assert_array_equal(r.read_block(30, 60).T, G[:, 30:60])
    np.testing.assert_array_equal(read_pgen(path), G)
    # corrupt-header bound: more variants than the record file can hold
    # must fail cheaply, not allocate
    with open(str(tmp_path / "fixed11.pgen.pgi"), "r+b") as fh:
        fh.seek(3)
        fh.write(np.asarray([10 ** 8], "<u4").tobytes())
    with pytest.raises(ValueError, match="truncated"):
        StandardPgen(path)


@pytest.mark.parametrize("nonref_code,ac_bytes", [(1, 0), (2, 0), (3, 0),
                                                  (0, 1), (3, 2)])
def test_standard_mode_header_aux_fields(tmp_path, nonref_code, ac_bytes):
    """The header control byte's bits 4-7: explicit allele counts and the
    2-bit provisional-reference code. Codes 0/1/2 store NO nonref
    bitarray (treating bit 6 alone as 'bitarray present' would corrupt
    every record offset for code-1 files); code 3 stores ceil(bm/8)
    bytes per block that the index parse must skip."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno_mode16(N=31, M=140, seed=21)
    path = str(tmp_path / f"aux{nonref_code}{ac_bytes}.pgen")
    write_pgen_standard(path, G, nonref_code=nonref_code,
                        allele_ct_bytes=ac_bytes)
    with open(path, "rb") as fh:
        fmt = fh.read(12)[11]
    assert (fmt >> 6) & 3 == nonref_code and (fmt >> 4) & 3 == ac_bytes
    r = StandardPgen(path)
    np.testing.assert_array_equal(r.read_block(0, r.M).T, G)


def test_standard_mode_onebit_semantics(tmp_path):
    """Handcrafted onebit record pinning the spec's header-byte encoding:
    low common value = C >> 2, second value = (C >> 2) + (C & 3). A
    decoder treating the two fields as independent genotype codes would
    produce different (wrong) calls for this fixture."""
    from neural_admixture_tpu.io.pgen_standard import StandardPgen
    N, M = 5, 3
    # record 0: onebit, C = (1 << 2) | 2 -> values {1, 3}; bitarray
    # 0b00000101 -> samples 0 and 2 get 3; empty difflist.
    rec0 = bytes([0x06, 0b00000101, 0x00])
    # record 1: vrtype 6 = difflist vs all-hom-alt; empty difflist.
    rec1 = bytes([0x00])
    # record 2: vrtype 7 = difflist vs all-missing; empty difflist.
    rec2 = bytes([0x00])
    recs = [rec0, rec1, rec2]
    vrtypes = bytes([1, 6, 7])
    path = tmp_path / "onebit.pgen"
    with open(path, "wb") as fh:
        fh.write(b"\x6c\x1b\x10")
        fh.write(np.asarray([M], "<u4").tobytes())
        fh.write(np.asarray([N], "<u4").tobytes())
        fh.write(bytes([0x04]))  # 8-bit vrtypes, 1-byte lengths
        rec_start = 12 + 8 + M + M
        fh.write(np.asarray([rec_start], "<u8").tobytes())
        fh.write(vrtypes)
        fh.write(bytes([len(r) for r in recs]))
        for r in recs:
            fh.write(r)
    r = StandardPgen(str(path))
    got = r.read_block(0, M)
    np.testing.assert_array_equal(got[0], [3, 1, 3, 1, 1])
    np.testing.assert_array_equal(got[1], [2] * N)
    np.testing.assert_array_equal(got[2], [3] * N)
    # the native path (when built) must agree on the same fixture
    try:
        from neural_admixture_tpu.native import bed_native
    except ImportError:
        return
    if bed_native.pgen_available():
        np.testing.assert_array_equal(
            StandardPgen(str(path))._read_block_native(bed_native, 0, M),
            got)


def test_standard_mode_0x11_separate_index(tmp_path):
    """Mode 0x11: records-only .pgen plus a companion .pgi holding the
    header/offsets/index. Decode must match mode 0x10 bit-exactly, and a
    missing .pgi must fail with a clear error."""
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno_mode16(N=27, M=130, seed=23)
    p10 = str(tmp_path / "m10.pgen")
    p11 = str(tmp_path / "m11.pgen")
    vr10 = write_pgen_standard(p10, G)
    vr11 = write_pgen_standard(p11, G, mode=0x11)
    assert vr10 == vr11
    assert (tmp_path / "m11.pgen.pgi").exists()
    r = StandardPgen(p11)
    assert r.mode == 0x11 and (r.N, r.M) == G.shape
    np.testing.assert_array_equal(r.read_block(0, r.M).T, G)
    np.testing.assert_array_equal(r.read_block(40, 90).T, G[:, 40:90])
    # routed through the generic opener too
    np.testing.assert_array_equal(read_pgen(p11), G)
    (tmp_path / "m11.pgen.pgi").unlink()
    with pytest.raises(FileNotFoundError, match="pgi"):
        StandardPgen(p11)


def test_standard_mode_matches_pgenlib(tmp_path):
    """Cross-validation against pgenlib itself: our mode-0x10 fixtures must
    decode identically through pgenlib, and a pgenlib-written file must
    decode identically through our reader. Runs only where the real
    pgenlib is installed (not this build environment -- see the
    verification-status note in io/pgen_standard.py)."""
    pgenlib = pytest.importorskip("pgenlib")
    if not hasattr(pgenlib, "PgenReader") or isinstance(
            pgenlib, types.ModuleType) and not getattr(
            pgenlib, "__file__", None):
        pytest.skip("fake pgenlib module")
    from neural_admixture_tpu.io.pgen_standard import (StandardPgen,
                                                       write_pgen_standard)
    G = _geno_mode16(N=31, M=120, seed=3)
    ours = str(tmp_path / "ours.pgen")
    write_pgen_standard(ours, G)
    reader = pgen_mod._PgenlibPgen(ours)
    np.testing.assert_array_equal(reader.read_block(0, G.shape[1]).T, G)

    theirs = str(tmp_path / "theirs.pgen")
    with pgenlib.PgenWriter(theirs.encode(), G.shape[0],
                            variant_ct=G.shape[1], nonref_flags=False) as w:
        buf = G.T.astype(np.int8)
        buf[G.T == 3] = -9
        for v in range(G.shape[1]):
            w.append_biallelic(np.ascontiguousarray(buf[v]))
    np.testing.assert_array_equal(
        StandardPgen(theirs).read_block(0, G.shape[1]).T, G)


def test_read_pgen_packed_rows_slices(tmp_path, monkeypatch):
    """The multi-host row-block read equals the full read's row slice
    (pre-flip), and the local code counts cover exactly those rows."""
    from neural_admixture_tpu.io.pgen import (pgen_dims,
                                              read_pgen_packed_rows)
    monkeypatch.setattr(pgen_mod, "_BLOCK_VARIANTS", 64)
    G = _geno(N=23, M=170)
    path = str(tmp_path / "rows.pgen")
    write_pgen_mode2(path, G)

    assert pgen_dims(path) == G.shape
    start, end = 7, 18
    packed_rows, counts = read_pgen_packed_rows(path, start, end)
    expected, _ = pack_with_padding(G[start:end])
    np.testing.assert_array_equal(packed_rows, expected)
    np.testing.assert_array_equal(
        counts, np.bincount(G[start:end].ravel(), minlength=4))
