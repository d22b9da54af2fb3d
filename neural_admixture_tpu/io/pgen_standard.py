"""Pure-Python decoder for PLINK2 PGEN "standard" storage mode (0x10).

plink2 writes mode-0x10 files by default: per-variant records compressed
with difflists (sparse / LD / onebit representations). The reference soft-
imports pgenlib for these (/root/reference/neural_admixture/src/
snp_reader.py:57-58) and cannot read them without it; this module makes
biobank PGENs work dependency-free. pgenlib is still PREFERRED when
importable (io.pgen.open_pgen tries it first) -- this is the fallback.

Implemented from the public PGEN specification draft
(github.com/chrchang/plink-ng, pgen_spec). Layout summary:

  header:   magic 6C 1B | mode 0x10 | variant_ct u32le | sample_ct u32le |
            format byte FMT
  FMT bits 0-3 (vrtype/length index encoding, values 0..7):
            vrtypes are 4-bit when value < 4 else 8-bit;
            record lengths are (value & 3) + 1 bytes each (LE).
  FMT bits 4-5: bytes per explicit allele count (0 = absent).
  FMT bit 6: per-variant provisional-reference flag bitarray present.
  then:     ceil(variant_ct / 2^16) u64le file positions, the k-th pointing
            at variant block k's INDEX (vrtypes array, then record lengths,
            then optional allele counts / nonref flags). The variant
            records themselves are contiguous, immediately following the
            LAST block index, in variant order.

  vrtype & 7 (main genotype track; codes 0=hom ref, 1=het, 2=hom alt,
  3=missing, 4 samples/byte, low bits first):
    0  plain 2-bit, ceil(N/4) bytes
    1  LD difflist: copy the most recent variant whose vrtype & 7 is not
       in {1, 2, 3}, then apply the difflist
    2  as 1, with the base genotypes inverted (0 <-> 2) first
    4  onebit: 1 header byte (bits 0-1 = common value A, bits 2-3 = value
       B), ceil(N/8) bitarray (bit set -> B), then a difflist of
       exceptions
    5  sparse difflist: all samples hom ref (0), then apply the difflist
  Higher vrtype bits (8-bit index) flag phase/dosage tracks appended to
  the record -- genotype decoding is unaffected, the extra bytes are
  covered by the record length; hardcalls-only consumers can ignore them.

  difflist: [vint L] and, when L > 0:
    [ceil(L/64) group-start sample ids, sample_id_bytes(N) bytes each]
    [ceil(L/4) bytes of 2-bit genotype values ("raregeno")]
    [L - ceil(L/64) vint deltas between consecutive sample ids, the
     per-group streams (63 deltas each) concatenated]
  vint = LEB128 (7 data bits/byte, high bit = continuation).

VERIFICATION STATUS: the layout above is from the public spec, and
write_pgen_standard below emits it, so reader and writer are pinned
mutually bit-exact across every record type (tests/test_pgen.py).
Cross-validation against pgenlib itself runs whenever pgenlib is
importable (test_pgen.py::test_standard_mode_matches_pgenlib) -- it is
not installed in this build environment, so spec-level deviations would
surface only in environments that have it; until then treat plink2-written
0x10 inputs as best-effort and prefer installing pgenlib for production.
"""
from typing import List, Tuple

import numpy as np

MAGIC = b"\x6c\x1b"
VBLOCK = 1 << 16  # variants per block


def _sample_id_bytes(n: int) -> int:
    """Bytes per stored sample id: smallest width holding n - 1."""
    b = 1
    while (n - 1) >> (8 * b):
        b += 1
    return b


def _read_vint(buf: np.ndarray, pos: int) -> Tuple[int, int]:
    val, shift = 0, 0
    while True:
        byte = int(buf[pos])
        pos += 1
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val, pos
        shift += 7


def _read_vints(buf: np.ndarray, pos: int, count: int
                ) -> Tuple[np.ndarray, int]:
    """Parse ``count`` consecutive LEB128 vints, vectorized for the common
    all-1-byte case (difflist deltas are almost always < 128)."""
    if count == 0:
        return np.zeros(0, np.int64), pos
    window = buf[pos:pos + 5 * count]
    if window.size >= count and not (window[:count] & 0x80).any():
        return window[:count].astype(np.int64), pos + count
    out = np.empty(count, np.int64)
    for i in range(count):
        out[i], pos = _read_vint(buf, pos)
    return out, pos


def _unpack2(raw: np.ndarray, n: int) -> np.ndarray:
    """ceil(n/4) packed bytes -> (n,) 2-bit values (io.packed layout)."""
    from .packed import unpack_2bit_rows
    return unpack_2bit_rows(raw.reshape(1, -1), n)[0]


def _pack2(vals: np.ndarray) -> np.ndarray:
    """(n,) 2-bit values -> ceil(n/4) packed bytes (io.packed layout)."""
    from .packed import pack_2bit_rows
    return pack_2bit_rows(vals.reshape(1, -1))[0]


def _parse_difflist(rec: np.ndarray, pos: int, n: int
                    ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(sample_ids, genotype_values, next_pos) of one difflist."""
    L, pos = _read_vint(rec, pos)
    if L == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint8), pos
    sid_b = _sample_id_bytes(n)
    n_groups = -(-L // 64)
    raw = rec[pos:pos + n_groups * sid_b].reshape(n_groups, sid_b)
    starts = (raw.astype(np.int64)
              @ (np.int64(1) << (8 * np.arange(sid_b, dtype=np.int64))))
    pos += n_groups * sid_b
    vals = _unpack2(rec[pos:pos + (-(-L // 4))], L)
    pos += -(-L // 4)
    deltas, pos = _read_vints(rec, pos, L - n_groups)
    ids = np.empty(L, np.int64)
    d0 = 0
    for g in range(n_groups):
        size = min(64, L - g * 64)
        ids[g * 64] = starts[g]
        if size > 1:
            ids[g * 64 + 1:g * 64 + size] = starts[g] + np.cumsum(
                deltas[d0:d0 + size - 1])
        d0 += size - 1
    return ids, vals, pos


_INVERT = np.array([2, 1, 0, 3], dtype=np.uint8)  # 0<->2, het/missing fixed


class StandardPgen:
    """Block reader for mode-0x10 PGEN files (same surface as io.pgen's
    readers: .N, .M, read_block(v0, v1) -> (v1-v0, N) uint8, missing=3)."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            head = fh.read(12)
        if head[:2] != MAGIC or head[2] != 0x10:
            raise ValueError(f"{path} is not a mode-0x10 PGEN file")
        self.path = path
        self.M = int(np.frombuffer(head[3:7], "<u4")[0])
        self.N = int(np.frombuffer(head[7:11], "<u4")[0])
        fmt = head[11]
        idx_enc = fmt & 0x0F
        if idx_enc > 7:
            raise NotImplementedError(
                f"PGEN index encoding {idx_enc} (format byte {fmt:#04x}) is "
                "not supported; install pgenlib.")
        self._vrtype8 = idx_enc >= 4
        self._len_b = (idx_enc & 3) + 1
        self._ac_b = (fmt >> 4) & 3
        self._nonref = bool(fmt & 0x40)
        if fmt & 0x80:
            raise NotImplementedError(
                f"PGEN format byte {fmt:#04x} sets an unknown bit; install "
                "pgenlib.")
        self._load_index()
        # Sequential-decode state: genotypes of the most recent non-LD
        # variant (the base the LD difflists patch), and the next variant
        # index the state is valid to continue from.
        self._ld_base_idx = -1
        self._ld_base = None
        self._next = 0
        # Native (C++) decoder state: caller-persisted LD base + validity
        # flag (see native/bed_decode.cpp na_pgen_decode).
        self._nat_base = np.zeros(self.N, np.uint8)
        self._nat_valid = np.zeros(1, np.int64)
        self._nat_next = 0

    def _load_index(self):
        n_blocks = -(-self.M // VBLOCK)
        with open(self.path, "rb") as fh:
            fh.seek(12)
            block_pos = np.fromfile(fh, "<u8", n_blocks)
            vrtypes = np.empty(self.M, np.uint8)
            vrec_len = np.empty(self.M, np.int64)
            end = 12 + 8 * n_blocks
            for b in range(n_blocks):
                bm = min(VBLOCK, self.M - b * VBLOCK)
                fh.seek(int(block_pos[b]))
                if self._vrtype8:
                    vt = np.fromfile(fh, np.uint8, bm)
                else:
                    raw = np.fromfile(fh, np.uint8, -(-bm // 2))
                    vt = ((raw[:, None] >> np.array([0, 4], np.uint8)) & 0xF
                          ).reshape(-1)[:bm].astype(np.uint8)
                vrtypes[b * VBLOCK:b * VBLOCK + bm] = vt
                raw = np.fromfile(fh, np.uint8, bm * self._len_b
                                  ).reshape(bm, self._len_b)
                vrec_len[b * VBLOCK:b * VBLOCK + bm] = raw.astype(np.int64) \
                    @ (np.int64(1) << (8 * np.arange(self._len_b,
                                                     dtype=np.int64)))
                skip = bm * self._ac_b + (-(-bm // 8) if self._nonref else 0)
                end = fh.tell() + skip
        self.vrtypes = vrtypes
        # Records are contiguous after the last block index.
        self.rec_pos = np.empty(self.M + 1, np.int64)
        self.rec_pos[0] = end
        np.cumsum(vrec_len, out=self.rec_pos[1:])
        self.rec_pos[1:] += end
        bad = ~np.isin(vrtypes & 7, (0, 1, 2, 4, 5))
        if bad.any():
            raise NotImplementedError(
                f"PGEN vrtype {int(vrtypes[bad.argmax()])} (main track "
                f"{int(vrtypes[bad.argmax()] & 7)}) is not supported; "
                "install pgenlib.")

    def _record(self, fh, v: int) -> np.ndarray:
        fh.seek(int(self.rec_pos[v]))
        return np.fromfile(fh, np.uint8,
                           int(self.rec_pos[v + 1] - self.rec_pos[v]))

    def _decode_one(self, fh, v: int) -> np.ndarray:
        """(N,) genotypes of variant v; maintains the LD-base state, so call
        in ascending order (read_block rewinds to the base when needed)."""
        t = self.vrtypes[v] & 7
        rec = self._record(fh, v)
        if t == 0:
            g = _unpack2(rec[:-(-self.N // 4)], self.N)
        elif t in (1, 2):
            assert self._ld_base_idx != -1, (v, "LD variant without a base")
            g = self._ld_base.copy() if t == 1 else _INVERT[self._ld_base]
            ids, vals, _ = _parse_difflist(rec, 0, self.N)
            g[ids] = vals
        elif t == 4:
            a, b = rec[0] & 3, (rec[0] >> 2) & 3
            bits = np.unpackbits(rec[1:1 + (-(-self.N // 8))],
                                 bitorder="little")[:self.N]
            g = np.where(bits, np.uint8(b), np.uint8(a))
            ids, vals, _ = _parse_difflist(rec, 1 + (-(-self.N // 8)), self.N)
            g[ids] = vals
        else:  # t == 5
            g = np.zeros(self.N, np.uint8)
            ids, vals, _ = _parse_difflist(rec, 0, self.N)
            g[ids] = vals
        if t not in (1, 2):
            self._ld_base_idx, self._ld_base = v, g
        return g

    def read_block(self, v0: int, v1: int) -> np.ndarray:
        """Dosages of variants [v0, v1) as (v1-v0, N) uint8, missing == 3.

        Uses the native C++ record decoder when built (same spec model,
        pinned bit-identical to this pure-Python path by tests); any
        native decode error falls back here."""
        try:
            from ..native import bed_native
            native_ok = bed_native.pgen_available()
        except ImportError:
            native_ok = False
        if native_ok and v1 > v0:
            try:
                return self._read_block_native(bed_native, v0, v1)
            except ValueError:
                self._nat_valid[0] = 0
        out = np.empty((v1 - v0, self.N), np.uint8)
        with open(self.path, "rb") as fh:
            start = v0
            if not (self._ld_base_idx >= 0 and v0 == self._next):
                # Random access: rewind to the nearest non-LD variant at or
                # before v0 and rebuild the LD-base state from it.
                while start > 0 and (self.vrtypes[start] & 7) in (1, 2):
                    start -= 1
                self._ld_base_idx = -1
            for v in range(start, v1):
                g = self._decode_one(fh, v)
                if v >= v0:
                    out[v - v0] = g
        self._next = v1
        return out

    def _read_block_native(self, bed_native, v0: int, v1: int) -> np.ndarray:
        """C++ decode of [v0, v1): one contiguous record read (rewound to
        the nearest non-LD variant when the persisted LD state cannot
        continue from v0)."""
        if self._nat_valid[0] and v0 == self._nat_next:
            start = v0
        else:
            start = v0
            while start > 0 and (self.vrtypes[start] & 7) in (1, 2):
                start -= 1
            self._nat_valid[0] = 0
        with open(self.path, "rb") as fh:
            fh.seek(int(self.rec_pos[start]))
            recs = np.fromfile(
                fh, np.uint8, int(self.rec_pos[v1] - self.rec_pos[start]))
        rec_off = (self.rec_pos[start:v1 + 1]
                   - self.rec_pos[start]).astype(np.int64)
        out = bed_native.pgen_decode(
            recs, rec_off, self.vrtypes[start:v1], v0 - start, self.N,
            _sample_id_bytes(self.N), self._nat_base, self._nat_valid)
        self._nat_next = v1
        return out


# ------------------------------ writer --------------------------------------


def _difflist_bytes(ids: np.ndarray, vals: np.ndarray, n: int) -> bytes:
    out = bytearray()
    L = ids.size
    _write_vint(out, L)
    if L == 0:
        return bytes(out)
    sid_b = _sample_id_bytes(n)
    n_groups = -(-L // 64)
    for g in range(n_groups):
        out += int(ids[g * 64]).to_bytes(sid_b, "little")
    out += _pack2(vals).tobytes()
    for g in range(n_groups):
        size = min(64, L - g * 64)
        for d in np.diff(ids[g * 64:g * 64 + size]):
            _write_vint(out, int(d))
    return bytes(out)


def _write_vint(out: bytearray, v: int) -> None:
    while True:
        if v < 0x80:
            out.append(v)
            return
        out.append(0x80 | (v & 0x7F))
        v >>= 7


def write_pgen_standard(path: str, G: np.ndarray, psam: bool = True,
                        ld_chain: bool = True, idx_enc: int = None
                        ) -> List[int]:
    """Write ``G`` (N, M) uint8 dosages (3 = missing) as a mode-0x10 PGEN,
    choosing the cheapest representation per variant like plink2 does
    (plain / sparse difflist / onebit / LD difflist vs the previous
    non-LD variant). ``idx_enc`` = the format byte's index encoding
    (0..3 = 4-bit vrtypes, 4..7 = 8-bit; (value & 3) + 1 length bytes);
    None = 8-bit vrtypes with the narrowest length width that fits the
    longest record (1 byte only covers N <= 1020: a plain record is
    ceil(N/4) bytes). Returns the chosen vrtypes (for tests asserting
    type coverage). Fixture/tooling writer -- it also pins the reader
    above bit-exactly."""
    G = np.ascontiguousarray(G, np.uint8)
    N, M = G.shape
    recs, vrtypes = [], []
    base = None

    def dl(mask, vals_src):
        ids = np.flatnonzero(mask).astype(np.int64)
        return _difflist_bytes(ids, vals_src[ids], N)

    for v in range(M):
        g = G[:, v]
        cands = [(0, _pack2(g).tobytes())]
        cands.append((5, dl(g != 0, g)))
        counts = np.bincount(g, minlength=4)
        top2 = np.argsort(-counts)[:2]
        a, b = int(top2[0]), int(top2[1])
        bits = np.packbits((g == b), bitorder="little")
        head = bytes([a | (b << 2)])
        cands.append((4, head + bits.tobytes()
                      + dl((g != a) & (g != b), g)))
        if base is not None and ld_chain and v % VBLOCK:
            cands.append((1, dl(g != base, g)))
            cands.append((2, dl(g != _INVERT[base], g)))
        t, rec = min(cands, key=lambda c: len(c[1]))
        vrtypes.append(t)
        recs.append(rec)
        if t not in (1, 2):
            base = g
    if idx_enc is None:
        max_len = max((len(r) for r in recs), default=0)
        len_b = 1
        while max_len >= 256 ** len_b:
            len_b += 1
        idx_enc = 4 + (len_b - 1)
    assert 0 <= idx_enc <= 7, idx_enc
    vrtype8 = idx_enc >= 4
    len_b = (idx_enc & 3) + 1
    with open(path, "wb") as fh:
        fh.write(MAGIC + b"\x10")
        fh.write(np.asarray([M], "<u4").tobytes())
        fh.write(np.asarray([N], "<u4").tobytes())
        fh.write(bytes([idx_enc]))  # no allele counts / nonref flags
        n_blocks = -(-M // VBLOCK)
        # Block indexes are contiguous after the offsets array (the reader
        # seeks via the offsets, so any layout works; contiguous is what
        # plink2 produces). Record lengths must fit len_b bytes -- assert
        # rather than silently truncate.
        pos = 12 + 8 * n_blocks
        offs = []
        for bk in range(n_blocks):
            bm = min(VBLOCK, M - bk * VBLOCK)
            offs.append(pos)
            pos += (bm if vrtype8 else -(-bm // 2)) + bm * len_b
        fh.write(np.asarray(offs, "<u8").tobytes())
        for bk in range(n_blocks):
            bm = min(VBLOCK, M - bk * VBLOCK)
            vt = np.asarray(vrtypes[bk * VBLOCK:bk * VBLOCK + bm], np.uint8)
            if vrtype8:
                fh.write(vt.tobytes())
            else:
                padded = np.zeros(-(-bm // 2) * 2, np.uint8)
                padded[:bm] = vt
                fh.write((padded[0::2] | (padded[1::2] << 4)).tobytes())
            lens = np.asarray(
                [len(r) for r in recs[bk * VBLOCK:bk * VBLOCK + bm]],
                np.int64)
            assert lens.max(initial=0) < 256 ** len_b, \
                f"record too long for {len_b}-byte lengths"
            le = np.zeros((bm, len_b), np.uint8)
            for j in range(len_b):
                le[:, j] = (lens >> (8 * j)) & 0xFF
            fh.write(le.tobytes())
        for rec in recs:
            fh.write(rec)
    if psam:
        from pathlib import Path
        with open(Path(path).with_suffix(".psam"), "w") as fh:
            fh.write("#IID\tSEX\n")
            for i in range(N):
                fh.write(f"sample{i}\tNA\n")
    return vrtypes
