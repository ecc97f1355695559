"""LZ engine vectors (reference zip/dict.rs and zip/back.rs test suites)."""

import struct

import numpy as np
import pytest

from cniic_tpu import native


def _syms(b: bytes):
    return list(np.frombuffer(b, dtype="<u2"))


# --- zip-dict (dict.rs:611-691) ---


@pytest.mark.parametrize("data,expected", [
    (b"", []),
    (bytes([1]), [1, 0xFFFF]),                      # odd symbol -> EOF marker
    (bytes([1, 2]), [1, 2]),
    (bytes([1, 2, 1, 3]), [1, 2, 1, 3]),
    (bytes([1, 2, 1, 2, 1, 2]), [1, 2, 0x0100, 0x0100]),  # dictionary hit
])
def test_zip_dict_exact_symbols(data, expected):
    assert _syms(native.zip_dict_encode(data)) == expected


@pytest.mark.parametrize("data", [
    b"", bytes([1]), bytes([1, 2]), bytes([1, 2, 1, 3]), bytes([1, 2, 1, 2, 1, 2]),
])
def test_zip_dict_roundtrip_vectors(data):
    assert native.zip_dict_decode(native.zip_dict_encode(data)) == data


def test_zip_dict_roundtrip_random(rng):
    for size, hi in [(10_000, 4), (50_000, 256), (3, 256), (65537, 2)]:
        data = rng.integers(0, hi, size).astype(np.uint8).tobytes()
        assert native.zip_dict_decode(native.zip_dict_encode(data)) == data


def test_zip_dict_symbol_exhaustion(rng):
    # enough entropy to exhaust the 16-bit symbol space
    data = rng.integers(0, 256, 2_000_000).astype(np.uint8).tobytes()
    assert native.zip_dict_decode(native.zip_dict_encode(data)) == data


# --- zip-back (back.rs:708-827) ---


def _explicit(data: bytes) -> bytes:
    return struct.pack("<H", len(data)) + data


def _lookback(length: int, back: int) -> bytes:
    return struct.pack("<HH", length | 0x8000, back)


@pytest.mark.parametrize("data,expected", [
    (b"", b""),
    (bytes([1]), _explicit(bytes([1]))),
    (bytes([1, 2]), _explicit(bytes([1, 2]))),
    (bytes([1, 1]), _explicit(bytes([1, 1]))),
    (bytes([1] * 6), _explicit(bytes([1] * 6))),
    (bytes([1] * 16), _explicit(bytes([1] * 8)) + _lookback(8, 8)),
    (bytes([1] * 8 + [2] * 8), _explicit(bytes([1] * 8 + [2] * 8))),
])
def test_zip_back_exact_streams(data, expected):
    assert native.zip_back_encode(data) == expected


@pytest.mark.parametrize("data", [
    b"", bytes([1]), bytes([1, 2]), bytes([1, 1]), bytes([1] * 6),
    bytes([1] * 16), bytes([1] * 8 + [2] * 8),
])
def test_zip_back_roundtrip_vectors(data):
    assert native.zip_back_decode(native.zip_back_encode(data)) == data


def test_zip_back_roundtrip_random(rng):
    for size, hi in [(10_000, 3), (100_000, 256), (200_000, 2), (70_000, 16)]:
        data = rng.integers(0, hi, size).astype(np.uint8).tobytes()
        assert native.zip_back_decode(native.zip_back_encode(data)) == data


def test_zip_back_ring_wraparound(rng):
    # > 2x the 65535-byte ring so the two-generation index ages out
    base = rng.integers(0, 256, 1000).astype(np.uint8).tobytes()
    data = base * 200  # 200 KB, highly repetitive
    enc = native.zip_back_encode(data)
    assert len(enc) < len(data) // 10
    assert native.zip_back_decode(enc) == data


def test_zip_back_explicit_cap_split(rng):
    """Documented divergence (PARITY.md #13): on inputs whose incompressible
    prefix exceeds the 15-bit explicit length field, the reference PANICS
    (the Symbol serialization assert at back.rs:45 — its doubling growth
    never flushes mid-run), while this engine flushes at 32767 and opens a
    fresh explicit run. Pin the chosen behavior: a 40KB matchless input
    becomes exactly Explicit(32767) + Explicit(7233) and round-trips."""
    data = rng.integers(0, 256, 40_000).astype(np.uint8).tobytes()
    enc = native.zip_back_encode(data)
    assert enc == _explicit(data[:32767]) + _explicit(data[32767:])
    assert native.zip_back_decode(enc) == data
