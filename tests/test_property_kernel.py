"""Hypothesis property tests over the pure-kernel surfaces.

The fixture suites pin the reference's exact values on known inputs;
these instead search the input space for violated invariants — the
binary codec's round-trip contract across its bucket-class boundaries,
the mergeability algebra the tier cascade rests on, and structural
guarantees of the peak/entropy kernels. No Spark session involved, so
the whole file runs in seconds.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from chronoxtract_spark import compression as cxc

# -- Gorilla codec ----------------------------------------------------------

# deltas spanning every dod bucket class ('0', 7b, 9b, 12b, 32b) plus
# sign flips; values spanning compressible and incompressible floats
_DELTAS = st.lists(
    st.integers(min_value=-100_000, max_value=100_000), min_size=0, max_size=300
)
_VALUES = st.lists(
    st.one_of(
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.floats(min_value=-10, max_value=10),
        st.just(0.0),
        st.just(float("inf")),
        st.just(float("-inf")),
        st.just(float("nan")),
    ),
    min_size=0,
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(t0=st.integers(min_value=0, max_value=2**40), deltas=_DELTAS, vals=_VALUES)
def test_chunk_roundtrip_bit_exact(t0, deltas, vals):
    n = min(len(deltas), len(vals))
    ts = t0 + np.concatenate(([0], np.cumsum(deltas[:n]))).astype(np.int64)[:n] \
        if n else np.array([], dtype=np.int64)
    v = np.array(vals[:n], dtype=np.float64)
    ch = cxc.encode_chunk(ts, v)
    rt_ts, rt_v = cxc.decode_chunk(ch["ts_bytes"], ch["val_bytes"])
    np.testing.assert_array_equal(rt_ts, ts)
    # bit-exact including NaN payloads and signed zeros / infinities
    np.testing.assert_array_equal(
        rt_v.view(np.uint64), v.view(np.uint64)
    )
    assert ch["n"] == n


def test_full_width_xor_roundtrip():
    """Pinned hypothesis counterexample: a value pair whose XOR has the
    top AND bottom bits set (64 meaningful bits) with magnitude within
    2^11 of 2^64. The old float-log2 leading-zero count rounded such a
    XOR up to exactly 2^64 (lz = -1, ml = 65), overflowing the 6-bit
    Gorilla header fields — the encoded stream was undecodable."""
    for pair in (
        [2.2250738585072014e-308, -1.7976931348622991e308],
        [2.2250738585072014e-308, -1.797693134862299e308],
        [5e-324, -1.7976931348623157e308],
    ):
        v = np.array(pair, dtype=np.float64)
        ts = np.array([0, 60], dtype=np.int64)
        ch = cxc.encode_chunk(ts, v)
        _, rt_v = cxc.decode_chunk(ch["ts_bytes"], ch["val_bytes"])
        np.testing.assert_array_equal(rt_v.view(np.uint64), v.view(np.uint64))


def _naive_pack_varbits(codes, nbits):
    """Per-row spec of the packed bitstream: the low nbits[i] bits of
    codes[i], MSB first, concatenated. The production packer is a
    vectorized unpackbits/gather pipeline — this pins its byte layout
    against an independent restatement."""
    bitstr = "".join(
        format(int(c) & ((1 << int(w)) - 1), f"0{int(w)}b")
        for c, w in zip(codes, nbits)
    )
    out = bytearray()
    for i in range(0, len(bitstr), 8):
        out.append(int(bitstr[i : i + 8].ljust(8, "0"), 2))
    return bytes(out)


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**64 - 1),
            st.integers(min_value=1, max_value=64),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_pack_varbits_matches_naive_spec(rows):
    codes = np.array([r[0] for r in rows], dtype=np.uint64)
    nbits = np.array([r[1] for r in rows], dtype=np.int64)
    assert cxc._pack_varbits(codes, nbits) == _naive_pack_varbits(codes, nbits)


@settings(max_examples=200, deadline=None)
@given(vals=_VALUES)
def test_encode_values_matches_naive_spec(vals):
    """The vectorized XOR encoder (closed-form lz/tz, scatter-packed
    wide rows) against a per-row restatement of the format: '0' on
    zero XOR, else '1' + 6b lz + 6b (ml-1) + ml meaningful bits."""
    v = np.array(vals, dtype=np.float64)
    bits = v.view(np.uint64) if v.size else np.array([], dtype=np.uint64)
    codes, widths = [], []
    for i in range(1, v.size):
        x = int(bits[i] ^ bits[i - 1])
        if x == 0:
            codes.append(0)
            widths.append(1)
            continue
        lz = 64 - x.bit_length()
        tz = (x & -x).bit_length() - 1
        ml = 64 - lz - tz
        head = (1 << 12) | (lz << 6) | (ml - 1)
        if 13 + ml <= 64:
            codes.append((head << ml) | (x >> tz))
            widths.append(13 + ml)
        else:
            codes.extend([head, x >> tz])
            widths.extend([13, ml])
    expected = cxc._MAGIC + np.uint32(v.size).tobytes()
    if v.size:
        expected += bits[0].tobytes()
    if v.size > 1:
        expected += _naive_pack_varbits(
            np.array(codes, dtype=np.uint64), np.array(widths, dtype=np.int64)
        )
    assert cxc.encode_values(v) == expected


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(min_value=64, max_value=1440),
    step=st.integers(min_value=1, max_value=3600),
)
def test_regular_series_compresses(n, step):
    """A perfectly regular minute grid (the dense tier's shape) must
    compress: every dod after the first delta is 0, so the timestamp
    stream approaches 1 bit/point. (Floor of 64 points — below that the
    fixed chunk headers dominate the ratio.)"""
    ts = np.arange(n, dtype=np.int64) * step
    v = np.full(n, 7.25)
    ch = cxc.encode_chunk(ts, v)
    assert ch["enc_size"] < ch["raw_size"] / 4


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=8),
            st.just(0),  # gap-fill zero runs dominate the dense stream
            st.integers(min_value=0, max_value=2**40),
        ),
        min_size=0,
        max_size=400,
    )
)
def test_val_size_analytic_on_integer_stream(counts):
    """The SQL_CHUNK_LAYOUT val_size oracle's bit arithmetic, asserted
    against the real encoder: for integer-valued doubles (the dense
    turns stream of the chunk_layout surface) the byte length of
    encode_values is 16 + ceil(sum(nbits)/8), where nbits per
    consecutive pair is 1 when the IEEE bit patterns are equal, else
    13 + meaningful-length of the XOR — and the bit pattern of integer
    k>0 is ((1022+bitlen)<<52) | ((k<<(53-bitlen)) - 2^52), exactly
    the integer expressions the DuckDB oracle runs."""

    def dbits(k: int) -> int:
        if k == 0:
            return 0
        blen = k.bit_length()
        return ((1022 + blen) << 52) | ((k << (53 - blen)) - (1 << 52))

    v = np.array(counts, dtype=np.float64)
    # the formula's bit patterns must equal numpy's actual IEEE view
    if v.size:
        np.testing.assert_array_equal(
            v.view(np.uint64), np.array([dbits(k) for k in counts], dtype=np.uint64)
        )
    total = 0
    for a, b in zip(counts, counts[1:]):
        x = dbits(a) ^ dbits(b)
        if x == 0:
            total += 1
        else:
            tz = (x & -x).bit_length() - 1
            total += 13 + (x.bit_length() - tz)
    expect = 8 + (8 if len(counts) >= 1 else 0) + (
        (total + 7) // 8 if len(counts) >= 2 else 0
    )
    assert len(cxc.encode_values(v)) == expect


# -- moment-state mergeability ---------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    ),
    cut=st.integers(min_value=0, max_value=200),
)
def test_moment_state_merges(data, cut):
    """The tier cascade's foundation: summing per-part raw-moment
    states reproduces the whole-series state — count/min/max exactly
    (integer/order-free), power sums to tight tolerance (float
    addition is not associative, so a split can differ by rounding;
    the bit-for-bit modulo-summation-order engine check lives in
    test_moment_state_merge_exact). Additionally, a SEQUENTIAL
    left-to-right whole-series sum must equal the sequential left part
    followed by the sequential right part — that one IS exact, it is
    the same chain of float additions."""
    x = np.array(data, dtype=np.float64)
    k = min(cut, len(x))

    def state(a):
        # mirrors functions.moment_state_exprs: n, s1..s4, min, max
        if a.size == 0:
            return np.zeros(5), None, None
        p = np.array(
            [a.size, a.sum(), (a * a).sum(), (a**3).sum(), (a**4).sum()]
        )
        return p, a.min(), a.max()

    whole, wmin, wmax = state(x)
    left, lmin, lmax = state(x[:k])
    right, rmin, rmax = state(x[k:])
    merged = left + right
    mins = [m for m in (lmin, rmin) if m is not None]
    maxs = [m for m in (lmax, rmax) if m is not None]
    # merged count/min/max are always exact
    assert merged[0] == whole[0] == len(x)
    assert min(mins) == wmin and max(maxs) == wmax
    np.testing.assert_allclose(merged[1:], whole[1:], rtol=1e-9, atol=1e-6)
    # the exact identity: continuing a sequential fold from the left
    # part's total over the right part equals the whole sequential fold
    for arr in (x, x * x, x**3, x**4):
        seq_whole = 0.0
        for val in arr:
            seq_whole += val
        seq_left = 0.0
        for val in arr[:k]:
            seq_left += val
        cont = seq_left
        for val in arr[k:]:
            cont += val
        assert cont == seq_whole


# -- peaks ------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=3,
        max_size=120,
    ),
    distance=st.one_of(st.none(), st.integers(min_value=1, max_value=20)),
)
def test_find_peaks_invariants(data, distance):
    from chronoxtract_spark.kernel.peaks import find_peaks

    x = np.array(data, dtype=np.float64)
    idx = np.asarray(find_peaks(x, distance=distance), dtype=np.int64)
    # interior indices only
    assert ((idx > 0) & (idx < len(x) - 1)).all()
    # each reported peak dominates its immediate neighborhood's edges
    for i in idx:
        assert x[i] >= x[i - 1] and x[i] >= x[i + 1]
    # greedy distance filter honored
    if distance is not None and idx.size > 1:
        assert (np.diff(np.sort(idx)) >= distance).all()
    # permutation of indices is unique and sorted ascending
    assert (np.diff(idx) > 0).all()


# -- entropy bounds ---------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=8,
        max_size=100,
    )
)
def test_permutation_entropy_bounds(data):
    from math import factorial, log

    from chronoxtract_spark.kernel.entropy import permutation_entropy

    x = np.array(data, dtype=np.float64)
    m = 3
    h = permutation_entropy(x, m=m, delay=1)
    assert 0.0 <= h <= log(factorial(m)) + 1e-12


@settings(max_examples=100, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=2,
        max_size=64,
    )
)
def test_lzc_bounds(data):
    from chronoxtract_spark.kernel.entropy import lempel_ziv_complexity

    x = np.array(data, dtype=np.float64)
    c = lempel_ziv_complexity(x)
    # LZ76 phrase count: at least 1, at most n (every symbol new)
    assert 1 <= c <= len(x)


# -- WAV codec --------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400
    ),
    sr=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    from chronoxtract_spark.operators.multimodal import decode_wav, encode_wav

    s = np.array(samples, dtype=np.int16)
    got_sr, back = decode_wav(encode_wav(s, sr))
    assert got_sr == sr
    np.testing.assert_array_equal(back, s)


# -- sampling thresholds ----------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    a=st.floats(min_value=0, max_value=1, allow_nan=False),
    b=st.floats(min_value=0, max_value=1, allow_nan=False),
)
def test_rate_threshold_monotone_and_bounded(a, b):
    from chronoxtract_spark.operators.sampling import U60, rate_threshold

    ta, tb = rate_threshold(a), rate_threshold(b)
    assert 0 <= ta <= U60 and 0 <= tb <= U60
    if a <= b:
        assert ta <= tb  # a larger rate never keeps fewer keys
