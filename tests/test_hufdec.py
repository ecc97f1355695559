"""On-chip chunked Huffman decode: parity with the host walker."""

import numpy as np
import pytest

from cniic_tpu import huffman, native
from cniic_tpu.ops import hufdec


def _stream(freqs, ids):
    book = huffman.build_codebook(freqs)
    leafs = np.zeros((freqs.size, 1), np.uint8)
    tree = huffman.serialize_tree(book, leafs)
    payload = huffman.encode_payload(ids.astype(np.int32), book, device=False)
    left, right, symbol, _, _ = huffman.parse_tree(
        np.frombuffer(tree, np.uint8), 1)
    return payload, left, right, symbol


@pytest.mark.parametrize("u,n", [(300, 40_000), (2, 30_000), (4096, 60_000)])
def test_device_decode_matches_walker(u, n, rng):
    freqs = rng.integers(1, 1000, u).astype(np.uint64)
    ids = rng.integers(0, u, n)
    payload, left, right, symbol = _stream(freqs, ids)
    want = native.huf_decode(payload, left, right, symbol, 0, n, fast=False)
    got = hufdec.decode_payload_device(payload, left, right, symbol, n)
    assert got is not None, "device path unexpectedly fell back"
    np.testing.assert_array_equal(got, want)


def test_device_decode_deep_codes_fall_back_or_match(rng):
    """Geometric frequencies force code lengths beyond E; the device path
    must either decode identically or return None (host fallback) — never
    a wrong stream."""
    u = 40
    freqs = (2.0 ** np.arange(u)).astype(np.uint64)
    ids = rng.integers(0, u, 30_000)
    payload, left, right, symbol = _stream(freqs, ids)
    got = hufdec.decode_payload_device(payload, left, right, symbol, ids.size)
    if got is not None:
        want = native.huf_decode(payload, left, right, symbol, 0, ids.size,
                                 fast=False)
        np.testing.assert_array_equal(got, want)


def test_device_decode_small_payload_falls_back(rng):
    freqs = np.array([5, 5, 5], np.uint64)
    ids = rng.integers(0, 3, 50)
    payload, left, right, symbol = _stream(freqs, ids)
    assert hufdec.decode_payload_device(payload, left, right, symbol, 50) is None


def test_env_gate_roundtrip(rng, monkeypatch):
    """CNIIC_DEVICE_HUF_DECODE=1 routes decode_payload through the device
    path; the full codec round trip must stay bit-exact."""
    from cniic_tpu.codecs import from_spec

    img = rng.integers(0, 256, (96, 96, 3)).astype(np.uint8)
    codec = from_spec("hufman")
    data = codec.encode(img)
    monkeypatch.setenv("CNIIC_DEVICE_HUF_DECODE", "1")
    # pin that the DEVICE path actually engaged: decode_payload_device
    # returning None silently falls back to the host walker, which would
    # make this round trip test nothing new (review r4)
    engaged = []
    real = hufdec.decode_payload_device

    def spy(*a, **k):
        out = real(*a, **k)
        engaged.append(out is not None)
        return out

    monkeypatch.setattr(hufdec, "decode_payload_device", spy)
    assert np.array_equal(codec.decode(data), img)
    assert engaged and all(engaged), "device decode path never engaged"


def test_device_decode_oversize_payload_falls_back(rng, monkeypatch):
    """Bit positions ride int32 lanes: payloads at/over _MAX_PAYLOAD_BYTES
    must return None (host fallback) before any chunk math wraps (review
    r5). Exercised by shrinking the cap — a real 256 MB payload would be
    CI-hostile."""
    freqs = rng.integers(1, 1000, 300).astype(np.uint64)
    ids = rng.integers(0, 300, 40_000)
    payload, left, right, symbol = _stream(freqs, ids)
    assert len(payload) >= hufdec.CHUNK_BYTES
    monkeypatch.setattr(hufdec, "_MAX_PAYLOAD_BYTES", len(payload))
    assert hufdec.decode_payload_device(payload, left, right, symbol,
                                        ids.size) is None
