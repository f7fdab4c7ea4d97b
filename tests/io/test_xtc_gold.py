"""Gold validation of the XTC (3dfcoord) codec against spec-derived fixtures.

Every other trajectory parser in this repo is checked against real
engine-produced files from the reference's test data; the reference's test
data ships no ``.xtc`` and no MD library is installed here, so the XTC codec
is instead validated against byte streams derived BY HAND from the published
xdrfile/libxdrf ``xdr3dfcoord`` algorithm (the format GROMACS writes; the
reference reads it through MDAnalysis, /root/reference/tfep/io/dataset/traj.py:43).

Three independence mechanisms, so a matched encoder/decoder bug cannot pass:

1. The expected bitstreams below are hand-derived field lists: every run
   decision, atom swap, and small-range drift was walked through on paper
   following the C algorithm's semantics, not by running this repo's
   encoder. The fields are packed by a 6-line MSB-first bignum packer local
   to this file — a different mechanism from the production ``_BitWriter``.
2. Structural header assertions parse the raw bytes with ``struct`` only
   (magic, atom counts, precision, minint/maxint vs independently-quantized
   coordinate bounds).
3. A binary golden file is committed (``tests/data/golden_waters.xtc`` +
   SHA-256 pin) so the encoder's byte output can never drift silently, and
   the C++ decoder (native/trajio.cpp) and the pure-Python decoder are both
   asserted against the SAME frozen bytes — not merely against each other's
   live round trip.
"""

import hashlib
import os
import struct

import numpy as np
import pytest

from tfep_tpu.io.xdr import (
    FIRSTIDX, MAGICINTS, XTC_MAGIC, read_xtc, write_xtc,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), '..', 'data')


def pack_msb_first(fields):
    """Independent MSB-first bit packer: fields = [(n_bits, value), ...].

    Accumulates into one big integer and serializes big-endian — a
    different mechanism from the production byte-at-a-time _BitWriter.
    """
    acc, total = 0, 0
    for n_bits, value in fields:
        assert 0 <= value < (1 << n_bits), (n_bits, value)
        acc = (acc << n_bits) | value
        total += n_bits
    pad = -total % 8
    return ((acc << pad)).to_bytes((total + pad) // 8, 'big')


def xtc_frame_header(n_atoms, step, time, box_nm=None):
    box = np.zeros((3, 3)) if box_nm is None else np.asarray(box_nm)
    return (struct.pack('>iiif', XTC_MAGIC, n_atoms, step, time)
            + struct.pack('>9f', *box.reshape(-1))
            + struct.pack('>i', n_atoms))


# =============================================================================
# The MAGICINTS table is pure spec data; lock its algebraic invariants.
# =============================================================================

# The published libxdrf table, indices FIRSTIDX..LASTIDX. This is wire-format
# data: any deviation makes real GROMACS files decode wrong, so it is pinned
# verbatim (note the historical quirks the format froze in: 5060 at index 37
# where 2^(37/3) is ~5161, and the 2^k-1 clamps at indices 57 and 69).
_PUBLISHED_MAGICINTS = [
    8, 10, 12, 16, 20, 25, 32, 40, 50, 64,
    80, 101, 128, 161, 203, 256, 322, 406, 512,
    645, 812, 1024, 1290, 1625, 2048, 2580, 3250, 4096,
    5060, 6501, 8192, 10321, 13003, 16384, 20642, 26007, 32768,
    41285, 52015, 65536, 82570, 104031, 131072, 165140, 208063, 262144,
    330280, 416127, 524287, 660561, 832255, 1048576, 1321122, 1664510,
    2097152, 2642245, 3329021, 4194304, 5284491, 6658042, 8388607,
    10568983, 13316085, 16777216,
]


def test_magicints_spec_invariants():
    # Table shape: indices below FIRSTIDX unused (zero), LASTIDX = 72.
    assert len(MAGICINTS) == 73
    assert all(v == 0 for v in MAGICINTS[:FIRSTIDX])
    assert list(MAGICINTS[FIRSTIDX:]) == _PUBLISHED_MAGICINTS

    for i in range(FIRSTIDX, len(MAGICINTS)):
        # Run deltas are encoded as a mixed-radix triple in exactly
        # `i` bits, so the cube of the range must fit in i bits — the
        # functional invariant the whole small-delta encoding relies on.
        assert MAGICINTS[i] ** 3 <= 2 ** i, i
        assert MAGICINTS[i] >= MAGICINTS[i - 1]


# =============================================================================
# Uncompressed path (n_atoms <= 9): exact bytes straight from the XDR spec.
# =============================================================================

def test_xtc_small_system_exact_bytes(tmp_path):
    """For <=9 atoms the spec stores plain big-endian float32 coordinates."""
    # Dyadic rationals: exactly representable in float32, so the decode
    # comparison below is exact.
    coords = np.array([[0.5, 0.25, 0.75],
                       [1.0, -1.5, 2.25],
                       [-0.125, 0.0625, 3.5]])
    box = np.diag([2.0, 3.0, 4.0]).astype(float)

    expected = (xtc_frame_header(3, 0, 0.5, box)
                + struct.pack('>9f', *coords.reshape(-1)))

    path = str(tmp_path / 'small.xtc')
    write_xtc(path, coords[None], boxes_nm=box[None],
              times_ps=np.array([0.5]))
    with open(path, 'rb') as f:
        assert f.read() == expected

    got, boxes, times = read_xtc(path)
    np.testing.assert_array_equal(got[0], coords)
    np.testing.assert_array_equal(boxes[0], box)
    assert times[0] == 0.5


# =============================================================================
# Compressed path: hand-derived bitstream, 10 atoms in a line.
# =============================================================================

# Walk of the xdr3dfcoord encoder for x = 0, 1, ..., 9 nm (y = z = 0) at
# precision 1000 (ints 0, 1000, ..., 9000), derived by hand from the
# algorithm spec:
#   minint=(0,0,0) maxint=(9000,0,0) sizeint=(9001,1,1) -> bitsize=14
#   mindiff=1000 -> smallidx=30 (magicints[30]=1024), maxidx=38, minidx=30,
#   smallnum=512, smaller=406, larger=magicints[38]//2=3250.
# Atom 0: no run (|dx|=1000 >= smallnum 512), anchor 0 in 14 bits,
#   run-change flag 1, 5-bit value run+is_smaller+1 = 1.
# Atoms 1-3: is_smaller=+1 each (|dx|=1000 < larger, smallidx<maxidx), no
#   swap (smallnum grows 512->645->812 but stays <= 1000); anchor written
#   as sendints: low byte first, then the remaining 6 high bits; flag 1,
#   value 0+1+1=2. smallidx drifts 30->31->32->33 (smallnum 645, 812, 1024).
# Atom 4 (smallnum now 1024 > 1000): swap with atom 5, anchor=5000,
#   run of one triple: delta=(4000-5000+1024, 1024, 1024)=(24,1024,1024)
#   mixed-radix in sizesmall=(2048)^3 -> 33 bits; combined
#   (24*2048+1024)*2048+1024 = 0x06200400, sent as 4 LE bytes + 1 zero bit;
#   flag 1, value 3+1+1=5. smallidx->34 (smallnum 1290, sizesmall 2580).
# Atom 6: swap with 7, anchor=7000, delta=(290,1290,1290) in 34 bits,
#   combined (290*2580+1290)*2580+1290 = 0x7341B2F2 -> 4 LE bytes + 2 zero
#   bits; run unchanged (3) but is_smaller=+1 -> flag 1 value 5.
#   smallidx->35 (smallnum 1625, sizesmall 3250).
# Atom 8: swap with 9, anchor=9000, delta=(625,1625,1625) in 35 bits,
#   combined (625*3250+1625)*3250+1625 = 0x189CC75BF -> 5 bytes: 4 LE bytes
#   + high byte 0x01 in the remaining 3 bits; flag 1 value 5.
_LINE10_FIELDS = [
    (14, 0),                      # atom 0 anchor (0,0,0)
    (1, 1), (5, 1),               # run change: run=0, is_smaller=0
    (8, 0xE8), (6, 0x03),         # atom 1 anchor 1000 = LE byte E8 + high 3
    (1, 1), (5, 2),               # run=0, is_smaller=+1
    (8, 0xD0), (6, 0x07),         # atom 2 anchor 2000
    (1, 1), (5, 2),
    (8, 0xB8), (6, 0x0B),         # atom 3 anchor 3000
    (1, 1), (5, 2),
    (8, 0x88), (6, 0x13),         # atom 4 anchor 5000 (swapped with 5)
    (1, 1), (5, 5),               # run=3, is_smaller=+1
    (8, 0x00), (8, 0x04), (8, 0x20), (8, 0x06), (1, 0),   # 0x06200400
    (8, 0x58), (6, 0x1B),         # atom 6 anchor 7000 (swapped with 7)
    (1, 1), (5, 5),
    (8, 0xF2), (8, 0xB2), (8, 0x41), (8, 0x73), (2, 0),   # 0x7341B2F2
    (8, 0x28), (6, 0x23),         # atom 8 anchor 9000 (swapped with 9)
    (1, 1), (5, 5),
    (8, 0xBF), (8, 0x75), (8, 0xCC), (8, 0x89), (3, 1),   # 0x189CC75BF
]


def _line10_expected_bytes():
    payload = pack_msb_first(_LINE10_FIELDS)
    assert len(payload) == 31      # 242 bits
    return (xtc_frame_header(10, 0, 0.0)
            + struct.pack('>f', 1000.0)
            + struct.pack('>3i', 0, 0, 0)          # minint
            + struct.pack('>3i', 9000, 0, 0)       # maxint
            + struct.pack('>i', 30)                # smallidx
            + struct.pack('>i', len(payload))
            + payload + b'\x00')                   # pad to 4


def test_xtc_compressed_hand_derived_bitstream(tmp_path):
    coords = np.zeros((10, 3))
    coords[:, 0] = np.arange(10, dtype=float)      # nm; ints 0..9000

    expected = _line10_expected_bytes()
    path = str(tmp_path / 'line10.xtc')
    write_xtc(path, coords[None])
    with open(path, 'rb') as f:
        written = f.read()
    assert written == expected

    # Pure-Python decoder recovers the exact quantized coordinates.
    got, _, _ = read_xtc(path)
    np.testing.assert_array_equal(got[0] * 1000.0, coords * 1000.0)

    # The C++ decoder decodes the SAME spec-derived bytes.
    _assert_native_decodes(path, coords[None])


# =============================================================================
# Large-coordinate path (sizeint > 0xFFFFFF): per-axis anchor bit widths.
# =============================================================================

# x = i * 14000 nm (ints i * 14_000_000), y = z = 0:
#   sizeint=(126_000_001, 1, 1) > 0xFFFFFF -> bitsize=0,
#   bitsizeint=(27, 1, 1); mindiff=14e6 -> smallidx=72 (=LASTIDX, so
#   is_smaller=+1 impossible); deltas >= smallnum=2^23 so no runs, and the
#   provisional is_smaller=-1 is reset to 0 when no run starts. Stream:
#   atom 0: anchors (27+1+1 bits), flag 1, value 1; atoms 1-9: anchors,
#   flag 0 (run length unchanged).
def _wide10_fields():
    fields = []
    for i in range(10):
        fields += [(27, i * 14_000_000), (1, 0), (1, 0)]
        fields += [(1, 1), (5, 1)] if i == 0 else [(1, 0)]
    return fields


def test_xtc_large_sizeint_hand_derived(tmp_path):
    coords = np.zeros((10, 3))
    coords[:, 0] = np.arange(10, dtype=float) * 14_000.0

    payload = pack_msb_first(_wide10_fields())
    assert len(payload) == 39      # 305 bits
    expected = (xtc_frame_header(10, 0, 0.0)
                + struct.pack('>f', 1000.0)
                + struct.pack('>3i', 0, 0, 0)
                + struct.pack('>3i', 126_000_000, 0, 0)
                + struct.pack('>i', 72)            # smallidx = LASTIDX
                + struct.pack('>i', len(payload))
                + payload + b'\x00')

    path = str(tmp_path / 'wide10.xtc')
    write_xtc(path, coords[None])
    with open(path, 'rb') as f:
        assert f.read() == expected

    got, _, _ = read_xtc(path)
    np.testing.assert_array_equal(got[0], coords)
    _assert_native_decodes(path, coords[None])


# =============================================================================
# Structural header checks: raw struct parsing, independent of the codec.
# =============================================================================

def test_xtc_header_fields_match_spec(tmp_path):
    rng = np.random.default_rng(7)
    coords = rng.normal(1.5, 0.8, (2, 40, 3))
    box = np.tile(np.diag([3.0, 3.0, 3.0]), (2, 1, 1)).astype(float)
    path = str(tmp_path / 'hdr.xtc')
    write_xtc(path, coords, boxes_nm=box, times_ps=np.array([0.0, 2.0]))
    with open(path, 'rb') as f:
        data = f.read()

    # Independent quantization (round half away from zero at precision).
    scaled = coords * 1000.0
    ints = np.where(scaled >= 0, np.floor(scaled + 0.5),
                    np.ceil(scaled - 0.5)).astype(np.int64)

    offset = 0
    for frame in range(2):
        magic, n_atoms, step, time = struct.unpack_from('>iiif', data, offset)
        assert magic == 1995 and n_atoms == 40
        assert step == frame and time == 2.0 * frame
        got_box = np.asarray(struct.unpack_from('>9f', data, offset + 16))
        np.testing.assert_array_equal(got_box.reshape(3, 3), box[frame])
        n_atoms2, = struct.unpack_from('>i', data, offset + 52)
        assert n_atoms2 == 40
        precision, = struct.unpack_from('>f', data, offset + 56)
        assert precision == 1000.0
        minint = struct.unpack_from('>3i', data, offset + 60)
        maxint = struct.unpack_from('>3i', data, offset + 72)
        np.testing.assert_array_equal(minint, ints[frame].min(axis=0))
        np.testing.assert_array_equal(maxint, ints[frame].max(axis=0))
        smallidx, n_bytes = struct.unpack_from('>ii', data, offset + 84)
        assert FIRSTIDX <= smallidx < len(MAGICINTS)
        assert n_bytes > 0
        offset += 92 + n_bytes + (-n_bytes % 4)
    assert offset == len(data)


# =============================================================================
# Frozen binary golden: the committed file pins the encoder's exact output,
# and both decoders are asserted against the SAME frozen bytes.
# =============================================================================

GOLDEN_XTC = os.path.join(DATA_DIR, 'golden_waters.xtc')
GOLDEN_SHA256 = '37c6db412133b85f67ac7a1109e33993fa032a306f21bc41394f299161785225'


def _golden_system():
    """Deterministic 150-atom 3-frame pseudo water box (nm, ps)."""
    rng = np.random.default_rng(20260819)
    centers = rng.uniform(0.2, 2.8, (50, 3))
    offsets = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [-0.033, 0.094, 0.0]])
    frame0 = (centers[:, None, :] + offsets[None]).reshape(150, 3)
    drift = rng.normal(0.0, 0.02, (3, 150, 3)).cumsum(axis=0)
    coords = frame0[None] + drift
    boxes = np.tile(np.diag([3.0, 3.0, 3.0]), (3, 1, 1)).astype(float)
    times = np.array([0.0, 0.4, 0.8])
    return coords, boxes, times


def test_golden_file_is_pinned():
    with open(GOLDEN_XTC, 'rb') as f:
        data = f.read()
    assert hashlib.sha256(data).hexdigest() == GOLDEN_SHA256, (
        'golden_waters.xtc changed on disk — the encoder output drifted or '
        'the fixture was regenerated; XTC bytes are frozen deliberately')


def test_golden_file_python_decode():
    coords, boxes, times = _golden_system()
    got, got_boxes, got_times = read_xtc(GOLDEN_XTC)
    assert got.shape == (3, 150, 3)
    # Exact at the stored quantization (precision 1000 -> 0.0005 nm).
    np.testing.assert_allclose(got, coords, atol=0.5001e-3)
    np.testing.assert_array_equal(got_boxes, boxes)
    # Times are stored as XDR float32 (0.4 ps is not exactly representable).
    np.testing.assert_array_equal(got_times,
                                  times.astype(np.float32).astype(float))


def test_golden_file_native_decode():
    coords, _, _ = _golden_system()
    _assert_native_decodes(GOLDEN_XTC, coords, atol=0.5001e-3)
    # Both decoders must recover the SAME quantized integers from the
    # same frozen bytes (their float arithmetic differs at f32 rounding:
    # the native path multiplies by a float32 1/precision).
    py, _, _ = read_xtc(GOLDEN_XTC)
    from tfep_tpu.io.frames import XtcFrameStore
    store = XtcFrameStore(GOLDEN_XTC)
    native = np.stack([store[i] for i in range(len(store))])
    np.testing.assert_array_equal(np.round(native.astype(np.float64) * 100),
                                  np.round(py * 1000))


def _assert_native_decodes(path, coords_nm, atol=1e-9):
    from tfep_tpu.io.frames import XtcFrameStore
    from tfep_tpu.io.native import native_available
    if not native_available():   # pragma: no cover - env without compiler
        pytest.skip('native decoder unavailable')
    store = XtcFrameStore(path)
    # Frame stores expose the framework convention (angstrom); the raw
    # codec works in the file's native nm.
    got_nm = np.stack([store[i] for i in range(len(store))]) / 10.0
    # rtol covers the native decoder's float32 1/precision arithmetic.
    np.testing.assert_allclose(got_nm, coords_nm, atol=max(atol, 1e-6),
                               rtol=1e-6)
