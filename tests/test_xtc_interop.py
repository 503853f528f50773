"""Byte-level interop validation of the native XTC codec.

An independent pure-Python implementation of GROMACS's xdr3dfcoord algorithm
(magicints table, mixed-radix encode/decode-ints, adaptive smallidx with
sticky run lengths, water-molecule atom swap) cross-checks the C++ codec in
`native/trajio/trajio.cpp` in both directions:

  - native write  -> python decode (exact integer-lattice agreement)
  - python encode -> native read   (exact agreement)

The Python encoder deliberately makes *different but spec-valid* choices where
the format allows them (it never emits small runs), so agreement is evidence
of format conformance rather than shared implementation quirks.

Reference role: mdtraj's XTCTrajectoryFile used by
`/root/reference/src/jamun/data/_mdtraj.py` and
`/root/reference/src/jamun/metrics/_save_trajectory.py`.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

MAGICINTS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 10, 12, 16, 20, 25, 32, 40, 50, 64,
    80, 101, 128, 161, 203, 256, 322, 406, 512, 645, 812, 1024, 1290,
    1625, 2048, 2580, 3250, 4096, 5060, 6501, 8192, 10321, 13003, 16384,
    20642, 26007, 32768, 41285, 52015, 65536, 82570, 104031, 131072,
    165140, 208063, 262144, 330280, 416127, 524287, 660561, 832255,
    1048576, 1321122, 1664510, 2097152, 2642245, 3329021, 4194304,
    5284491, 6658042, 8388607, 10568983, 13316085, 16777216,
]
FIRSTIDX = 9
XTC_MAGIC = 1995


def sizeofint(size: int) -> int:
    bits, num = 0, 1
    while size >= num and bits < 32:
        bits += 1
        num <<= 1
    return bits


def sizeofints(sizes) -> int:
    prod = 1
    for s in sizes:
        prod *= int(s)
    # bits of the mixed-radix product, computed the xdrfile way (byte arith)
    nbytes = 0
    p = prod
    top = 0
    while True:
        top = p & 0xFF
        p >>= 8
        if p == 0:
            break
        nbytes += 1
    bits, num = 0, 1
    while top >= num:
        bits += 1
        num *= 2
    return bits + nbytes * 8


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def get(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value: int, nbits: int):
        for b in range(nbits - 1, -1, -1):
            self.bits.append((value >> b) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits + [0] * ((8 - len(self.bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def decodeints(br: BitReader, nbits: int, sizes):
    """Mixed-radix decode of 3 ints (xdrfile receiveints semantics)."""
    nums_bytes = []
    while nbits > 8:
        nums_bytes.append(br.get(8))
        nbits -= 8
    if nbits > 0:
        nums_bytes.append(br.get(nbits))
    # little-endian bytes -> big integer
    big = 0
    for j in range(len(nums_bytes) - 1, -1, -1):
        big = (big << 8) | nums_bytes[j]
    out = [0, 0, 0]
    for i in (2, 1):
        out[i] = big % int(sizes[i])
        big //= int(sizes[i])
    out[0] = big
    return out


def encodeints(bw: BitWriter, nbits: int, sizes, nums):
    big = int(nums[0])
    for i in (1, 2):
        big = big * int(sizes[i]) + int(nums[i])
    # emit LSB-first bytes, then the remaining (high) bits
    nbytes = max(1, (big.bit_length() + 7) // 8)
    if nbits >= nbytes * 8:
        for i in range(nbytes):
            bw.put((big >> (8 * i)) & 0xFF, 8)
        bw.put(0, nbits - nbytes * 8)
    else:
        for i in range(nbytes - 1):
            bw.put((big >> (8 * i)) & 0xFF, 8)
        bw.put(big >> (8 * (nbytes - 1)), nbits - (nbytes - 1) * 8)


def py_decode_xtc(path: str):
    """Decode ALL frames of an .xtc file. Returns (coords [F, N, 3] float32,
    int lattice [F, N, 3])."""
    frames, lattices = [], []
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from(">i", data, off)
        off += 4
        return v

    def f32():
        nonlocal off
        (v,) = struct.unpack_from(">f", data, off)
        off += 4
        return v

    while off < len(data):
        magic = u32()
        assert magic == XTC_MAGIC, magic
        natoms = u32()
        u32()  # step
        f32()  # time
        for _ in range(9):
            f32()  # box
        lsize = u32()
        assert lsize == natoms
        if natoms <= 9:
            xyz = np.array([f32() for _ in range(natoms * 3)], np.float32)
            frames.append(xyz.reshape(natoms, 3))
            lattices.append(None)
            continue
        precision = f32()
        minint = [u32() for _ in range(3)]
        maxint = [u32() for _ in range(3)]
        sizeint = [maxint[d] - minint[d] + 1 for d in range(3)]
        if (sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF:
            bitsizeint = [sizeofint(s) for s in sizeint]
            bitsize = 0
        else:
            bitsize = sizeofints(sizeint)
        smallidx = u32()
        smaller = MAGICINTS[max(FIRSTIDX, smallidx - 1)] // 2
        smallnum = MAGICINTS[smallidx] // 2
        sizesmall = [MAGICINTS[smallidx]] * 3
        nbytes = u32()
        br = BitReader(data[off : off + nbytes])
        off += nbytes + ((4 - nbytes % 4) % 4)

        ints = np.zeros((natoms, 3), np.int64)
        run = 0
        i = 0
        o = 0
        prev = [0, 0, 0]
        while i < natoms:
            if bitsize == 0:
                this = [br.get(bitsizeint[d]) for d in range(3)]
            else:
                this = decodeints(br, bitsize, sizeint)
            i += 1
            this = [this[d] + minint[d] for d in range(3)]
            prev = list(this)
            flag = br.get(1)
            is_smaller = 0
            if flag == 1:
                run = br.get(5)
                is_smaller = run % 3
                run -= is_smaller
                is_smaller -= 1
            if run > 0:
                for k in range(0, run, 3):
                    small = decodeints(br, smallidx, sizesmall)
                    i += 1
                    this = [small[d] + prev[d] - smallnum for d in range(3)]
                    if k == 0:
                        this, prev = prev, this
                        ints[o] = prev
                        o += 1
                    else:
                        prev = list(this)
                    ints[o] = this
                    o += 1
            else:
                ints[o] = this
                o += 1
            smallidx += is_smaller
            if is_smaller < 0:
                smallnum = smaller
                smaller = MAGICINTS[smallidx - 1] // 2 if smallidx > FIRSTIDX else 0
            elif is_smaller > 0:
                smaller = smallnum
                smallnum = MAGICINTS[smallidx] // 2
            sizesmall = [MAGICINTS[smallidx]] * 3
        assert o == natoms
        frames.append((ints / precision).astype(np.float32))
        lattices.append(ints.copy())
    return frames, lattices


def py_encode_xtc(path: str, coords: np.ndarray, precision: float = 1000.0):
    """Encode frames [F, N, 3] using only absolute triples (run-free — a
    different but valid choice from the native encoder's)."""
    F, N, _ = coords.shape
    out = bytearray()

    def put_i(v):
        out.extend(struct.pack(">i", int(v)))

    def put_f(v):
        out.extend(struct.pack(">f", float(v)))

    for fr in range(F):
        put_i(XTC_MAGIC)
        put_i(N)
        put_i(fr)
        put_f(float(fr))
        for _ in range(9):
            put_f(0.0)
        put_i(N)
        xyz = coords[fr]
        if N <= 9:
            for v in xyz.reshape(-1):
                put_f(v)
            continue
        put_f(precision)
        scaled = xyz.astype(np.float64) * precision
        ints = np.where(scaled >= 0, scaled + 0.5, scaled - 0.5).astype(np.int64)
        minint = ints.min(axis=0)
        maxint = ints.max(axis=0)
        for d in range(3):
            put_i(minint[d])
        for d in range(3):
            put_i(maxint[d])
        sizeint = [int(maxint[d] - minint[d] + 1) for d in range(3)]
        if (sizeint[0] | sizeint[1] | sizeint[2]) > 0xFFFFFF:
            bitsizeint = [sizeofint(s) for s in sizeint]
            bitsize = 0
        else:
            bitsize = sizeofints(sizeint)
        # any smallidx in range is valid since we emit no runs; pick one that
        # differs from what the native encoder would typically choose
        smallidx = FIRSTIDX + 3
        put_i(smallidx)
        bw = BitWriter()
        rel = ints - minint[None, :]
        for a in range(N):
            if bitsize == 0:
                for d in range(3):
                    bw.put(int(rel[a, d]), bitsizeint[d])
            else:
                encodeints(bw, bitsize, sizeint, rel[a])
            # flag = 1 with encoded run 0 + is_smaller 0 -> 5-bit value 1.
            # (flag = 0 would reuse the PREVIOUS run length, which is sticky
            # and starts undefined; always announcing run=0 is the simple
            # valid choice.)
            bw.put(1, 1)
            bw.put(1, 5)
        stream = bw.tobytes()
        put_i(len(stream))
        out.extend(stream)
        out.extend(b"\x00" * ((4 - len(stream) % 4) % 4))
    with open(path, "wb") as fh:
        fh.write(out)


# ---------------------------------------------------------------------------


def _native():
    from jamun_tpu.data import _native_io

    return _native_io


def _cases(rng):
    # (name, coords [F, N, 3], precision)
    peptide = rng.standard_normal((3, 40, 3)).astype(np.float32) * 0.4
    # water-like: consecutive atom triplets very close -> exercises runs + swap
    waters = np.repeat(rng.standard_normal((2, 17, 3)), 3, axis=1).astype(np.float32)
    waters += rng.standard_normal(waters.shape).astype(np.float32) * 0.01
    tiny = rng.standard_normal((2, 7, 3)).astype(np.float32)  # natoms <= 9 path
    wide = (rng.standard_normal((1, 25, 3)) * 40.0).astype(np.float32)  # bitsize=0 at 1e6
    mixed = np.concatenate(
        [np.repeat(rng.standard_normal((1, 8, 3)), 4, axis=1)
         + 0.005 * rng.standard_normal((1, 32, 3)),
         rng.standard_normal((1, 18, 3)) * 0.5],
        axis=1,
    ).astype(np.float32)
    return [
        ("peptide", peptide, 1000.0),
        ("waters", waters, 1000.0),
        ("tiny", tiny, 1000.0),
        ("wide", wide, 1e6),
        ("mixed", mixed, 10000.0),
    ]


def test_native_write_python_read(tmp_path):
    nio = _native()
    rng = np.random.default_rng(0)
    for name, coords, prec in _cases(rng):
        p = str(tmp_path / f"{name}.xtc")
        nio.write_xtc(p, coords, precision=prec)
        frames, lattices = py_decode_xtc(p)
        assert len(frames) == coords.shape[0], name
        for fr, dec in enumerate(frames):
            # exact on the integer lattice; the scale+round happens in float32
            # in the codec (as in GROMACS), which matters for wide coordinates
            expect = coords[fr] * np.float32(prec)
            expect = np.where(
                expect >= 0, expect + np.float32(0.5), expect - np.float32(0.5)
            ).astype(np.int64)
            if lattices[fr] is None:  # natoms <= 9: plain floats
                np.testing.assert_array_equal(dec, coords[fr])
            else:
                np.testing.assert_array_equal(lattices[fr], expect, err_msg=name)


def test_python_write_native_read(tmp_path):
    nio = _native()
    rng = np.random.default_rng(1)
    for name, coords, prec in _cases(rng):
        p = str(tmp_path / f"{name}.xtc")
        py_encode_xtc(p, coords, precision=prec)
        dec = nio.read_xtc(p)
        assert dec.shape == coords.shape, name
        np.testing.assert_allclose(dec, coords, atol=1.01 / prec, err_msg=name)


def test_native_roundtrip_exact_lattice(tmp_path):
    nio = _native()
    rng = np.random.default_rng(2)
    for name, coords, prec in _cases(rng):
        p = str(tmp_path / f"{name}.xtc")
        nio.write_xtc(p, coords, precision=prec)
        dec = nio.read_xtc(p)
        np.testing.assert_allclose(dec, coords, atol=1.01 / prec, err_msg=name)
