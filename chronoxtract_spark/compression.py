"""Gorilla XOR / delta-of-delta chunk codec.

The north rule requires per-window series to be "compressed with a
Gorilla XOR / delta-of-delta encoder implemented as a vectorized Arrow
UDF emitting binary-packed chunk structs" (BASELINE.json:north_star).
The reference has no compression subsystem (SURVEY.md §2.1) — this
codec is engine-native.

Encoding (per chunk = one conversation-window's gap-filled series):

- **timestamps**: delta-of-delta with Gorilla's bucket classes
  (Pelkonen et al. 2015, "Gorilla: A Fast, Scalable, In-Memory Time
  Series Database", VLDB §4.1.1): header = t0 (64b) + first delta
  (32b); then per point '0' for dod==0, '10'+7b for [-63,64],
  '110'+9b for [-255,256], '1110'+12b for [-2047,2048], else
  '1111'+32b.
- **values**: XOR float compression (§4.1.2 of the paper) in the
  vectorization-friendly variant: '0' when XOR with the previous value
  is zero, else '1' + 6b leading-zero count + 6b meaningful-bit length
  + the meaningful bits. (The paper's previous-window-reuse branch is
  a sequential data dependence; dropping it costs a few % ratio and
  makes the whole encode expressible as flat numpy array ops — the
  right trade at 10^12 points.)

Both streams are produced entirely with numpy array ops (bit matrices
+ ``np.packbits``) — zero per-point Python in the encode path. The
decoder is a sequential bit cursor (used for point reads and the
round-trip tests; tier rebuilds never decompress — they re-aggregate
the mergeable moment state, SURVEY.md §4.3).
"""

from __future__ import annotations

import zlib

import numpy as np

_MAGIC = b"CXG1"


def _pack_varbits(codes: np.ndarray, nbits: np.ndarray) -> bytes:
    """Concatenate the low ``nbits[i]`` bits of ``codes[i]`` into a
    packed big-endian bitstream. Fully vectorized: left-align each
    code's kept bits, explode to a uint8 bit plane with
    ``np.unpackbits``, gather the ragged per-row prefixes with one
    integer index, repack. (Replaces an (n, 64)-uint64 bit matrix +
    boolean fancy-index — ~8x less memory traffic, same bytes out.)"""
    codes = codes.astype(np.uint64)
    nbits = nbits.astype(np.int64)
    n = codes.size
    if n == 0:
        return b""
    # widths outside [1, 64] would make the alignment shift undefined
    # (uint64 << 64 is platform-undefined); ValueError, not assert, so
    # the guard survives python -O
    if nbits.min() < 1 or nbits.max() > 64:
        raise ValueError("code width out of [1,64]")
    # kept bits moved to the top of each word, then one C-speed bit
    # explode; row i's payload is bit plane [i*64, i*64 + nbits[i])
    aligned = codes << (64 - nbits).astype(np.uint64)
    bits = np.unpackbits(aligned.astype(">u8").view(np.uint8))
    total = int(nbits.sum())
    ends = np.cumsum(nbits)
    # gather index = (row*64 + position-within-run); the within-run
    # arange and the row base fold into ONE repeat:
    #   arange(total) - repeat(run_start) + repeat(row*64)
    base = np.arange(n, dtype=np.int64) * 64 - (ends - nbits)
    flat = bits[np.arange(total, dtype=np.int64) + np.repeat(base, nbits)]
    return np.packbits(flat).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, payload: bytes):
        self.bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        # one vectorized dot per CODE instead of a Python loop per BIT
        # (~10x on point reads; the encoder stays the hot production
        # path, this serves point lookups and the round-trip tests)
        if n > 64:
            raise ValueError(f"_BitReader.read supports codes <= 64 bits, got {n}")
        b = self.bits[self.pos : self.pos + n].astype(np.uint64)
        self.pos += n
        if b.size == 0:
            return 0
        w = np.left_shift(
            np.uint64(1), np.arange(b.size - 1, -1, -1, dtype=np.uint64)
        )
        return int(b @ w)


# -- timestamp stream --------------------------------------------------------

_TS_CLASSES = (
    (64, 7, 0b10, 2),       # dod in [-63, 64]   -> '10'  + 7 bits
    (256, 9, 0b110, 3),     # dod in [-255, 256] -> '110' + 9 bits
    (2048, 12, 0b1110, 4),  # dod in [-2047,2048]-> '1110'+ 12 bits
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 epoch-seconds (must be sorted)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = ts.size
    header = _MAGIC + np.uint32(n).tobytes()
    if n == 0:
        return header
    header += ts[0].astype(np.int64).tobytes()
    if n == 1:
        return header
    deltas = np.diff(ts)
    header += np.int64(deltas[0]).tobytes()
    if n == 2:
        return header
    dod = np.diff(deltas)

    if not dod.any():
        # dense regular grid (every gap-filled day chunk): all n-2
        # delta-of-delta codes are the 1-bit '0' control, so the packed
        # stream is analytically ceil((n-2)/8) zero bytes — byte-equal
        # to _pack_varbits on all-zero 1-bit codes (np.packbits
        # zero-pads), at none of the bit-plane gather cost
        return header + bytes((dod.size + 7) // 8)

    codes = np.zeros(dod.size, dtype=np.uint64)
    nbits = np.zeros(dod.size, dtype=np.int64)
    done = dod == 0  # control '0', zero bits of payload
    nbits[done] = 1  # just the control bit
    codes[done] = 0
    for hi, width, ctrl, ctrl_bits in _TS_CLASSES:
        sel = (~done) & (dod >= -(hi - 1)) & (dod <= hi)
        codes[sel] = (np.uint64(ctrl) << np.uint64(width)) | (
            (dod[sel] + (hi - 1)).astype(np.uint64)
        )
        nbits[sel] = ctrl_bits + width
        done |= sel
    rest = ~done
    codes[rest] = (np.uint64(0b1111) << np.uint64(32)) | (
        dod[rest].astype(np.int64).astype(np.uint32).astype(np.uint64)
    )
    nbits[rest] = 4 + 32
    return header + _pack_varbits(codes, nbits)


def decode_timestamps(payload: bytes) -> np.ndarray:
    assert payload[:4] == _MAGIC, "bad chunk magic"
    n = int(np.frombuffer(payload[4:8], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = int(np.frombuffer(payload[8:16], dtype=np.int64)[0])
    if n == 1:
        return np.array([t0], dtype=np.int64)
    d0 = int(np.frombuffer(payload[16:24], dtype=np.int64)[0])
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1] = t0 + d0
    r = _BitReader(payload[24:])
    delta = d0
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                raw = r.read(32)
                dod = raw - (1 << 32) if raw >= (1 << 31) else raw
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# -- value stream ------------------------------------------------------------


def encode_values(vals: np.ndarray) -> bytes:
    """Gorilla XOR-encode float64 values (vectorized variant, see
    module docstring)."""
    v = np.asarray(vals, dtype=np.float64)
    n = v.size
    header = _MAGIC + np.uint32(n).tobytes()
    if n == 0:
        return header
    bits = v.view(np.uint64)
    header += bits[0].tobytes()
    if n == 1:
        return header
    xor = bits[1:] ^ bits[:-1]

    zero = xor == 0
    # leading zeros via exact bit length: frexp's exponent on
    # float64(xor) IS the bit length except when rounding-to-nearest
    # crosses a power of two UPWARD (a uint64 within 2^11 of 2^64
    # rounds to exactly 2^64 — the hypothesis-found full-width-XOR
    # bug class); rounding can never cross a boundary downward, so a
    # single carry-back correction wherever bit (bl-1) is unset makes
    # the estimate exact for every nonzero input
    bl = np.frexp(xor.astype(np.float64))[1].astype(np.int64)
    probe = xor >> np.clip(bl - 1, 0, 63).astype(np.uint64)
    bl -= (bl > 64) | ((probe & np.uint64(1)) == 0)
    lz = np.where(zero, 64, 64 - bl)
    # trailing zeros: the lowest set bit (x & -x) is a power of two
    # <= 2^63, exactly representable in float64, so its log2 is exact
    lsb = xor & (np.uint64(0) - xor)
    tz = np.where(
        zero, 0, np.log2(np.where(zero, 1, lsb).astype(np.float64)).astype(np.int64)
    )

    ml = np.where(zero, 0, 64 - lz - tz)  # meaningful bit length
    meaningful = np.where(zero, np.uint64(0), xor >> tz.astype(np.uint64))

    # '1' + lz(6) + (ml-1)(6) + meaningful bits; ml in [1,64] stored as ml-1
    ctrl = np.uint64(1)
    head = (ctrl << np.uint64(12)) | (
        np.where(zero, 0, lz).astype(np.uint64) << np.uint64(6)
    ) | np.where(zero, 0, ml - 1).clip(0).astype(np.uint64)
    nbits = np.where(zero, 1, 13 + ml)
    # rows with nbits > 64 are re-emitted by _pack_wide; zero their
    # shift here so the uint64 << stays defined (x86 shifts are mod 64)
    ml_shift = np.where(nbits > 64, 0, ml).astype(np.uint64)
    codes = (head << ml_shift) | meaningful
    codes = np.where(zero, np.uint64(0), codes)
    # entries with ml > 51 overflow the 64-bit code word (13+ml > 64):
    # fall back to a two-word emit for those rare rows
    wide = (~zero) & (nbits > 64)
    if wide.any():
        return header + _pack_wide(codes, nbits, xor, lz, ml, zero, wide)
    return header + _pack_varbits(codes, nbits)


def _pack_wide(codes, nbits, xor, lz, ml, zero, wide):
    """Split wide rows (header word + payload word) and re-pack.

    Vectorized: each row owns a slot run (1 word, or 2 for wide rows)
    in the output arrays; scatter the first words at each run start and
    the wide payload words at start+1. Byte-identical to the old
    per-row loop (same word order, same widths) — one wide row used to
    drop the WHOLE chunk into Python; at ~7% wide rows on interpolated
    gap-fill values that was nearly every production chunk."""
    n = xor.size
    counts = 1 + wide.astype(np.int64)
    starts = np.cumsum(counts) - counts
    out_codes = np.zeros(int(counts.sum()), dtype=np.uint64)
    out_bits = np.empty(out_codes.size, dtype=np.int64)
    head = (
        (np.uint64(1) << np.uint64(12))
        | (np.where(zero, 0, lz).astype(np.uint64) << np.uint64(6))
        | np.where(zero, 0, ml - 1).clip(0).astype(np.uint64)
    )
    out_codes[starts] = np.where(zero, np.uint64(0), np.where(wide, head, codes))
    out_bits[starts] = np.where(zero, 1, np.where(wide, 13, nbits))
    out_codes[starts[wide] + 1] = xor[wide] >> (64 - lz[wide] - ml[wide]).astype(
        np.uint64
    )
    out_bits[starts[wide] + 1] = ml[wide]
    return _pack_varbits(out_codes, out_bits)


def decode_values(payload: bytes) -> np.ndarray:
    assert payload[:4] == _MAGIC, "bad chunk magic"
    n = int(np.frombuffer(payload[4:8], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0)
    first = np.frombuffer(payload[8:16], dtype=np.uint64)[0]
    out_bits = np.empty(n, dtype=np.uint64)
    out_bits[0] = first
    r = _BitReader(payload[16:])
    prev = int(first)
    for i in range(1, n):
        if r.read(1) == 0:
            out_bits[i] = prev
            continue
        lz = r.read(6)
        ml = r.read(6) + 1
        meaningful = r.read(ml)
        tz = 64 - lz - ml
        cur = prev ^ (meaningful << tz)
        out_bits[i] = cur
        prev = cur
    return out_bits.view(np.float64)


# -- chunk struct ------------------------------------------------------------


def encode_chunk(ts: np.ndarray, vals: np.ndarray) -> dict:
    """One binary chunk struct: the north-rule schema
    (chunk payloads + checksum + count + t0)."""
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    ts_b = encode_timestamps(ts)
    val_b = encode_values(vals)
    payload = ts_b + val_b
    return {
        "t0": int(ts[0]) if ts.size else 0,
        "n": int(ts.size),
        "ts_bytes": ts_b,
        "val_bytes": val_b,
        "checksum": zlib.crc32(payload) & 0xFFFFFFFF,
        "raw_size": int(ts.size * 16),
        "enc_size": len(payload),
    }


def decode_chunk(ts_bytes: bytes, val_bytes: bytes) -> tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(ts_bytes), decode_values(val_bytes)
