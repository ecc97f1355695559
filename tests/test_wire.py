"""Wire-format vectors, including the reference's bit.rs test suite."""

import numpy as np
import pytest

from cniic_tpu import wire


def test_scalar_le():
    assert wire.pack_u16(0x0102) == bytes([2, 1])
    assert wire.pack_i16(-2) == bytes([0xFE, 0xFF])
    assert wire.pack_u32(0x01020304) == bytes([4, 3, 2, 1])
    assert wire.pack_u64(3) == bytes([3, 0, 0, 0, 0, 0, 0, 0])


def test_rgb_11_byte_quirk():
    # ser.rs:210-222: u64 len prefix "3" + payload = 11 bytes
    b = wire.pack_rgb(9, 8, 7)
    assert len(b) == 11
    assert b == bytes([3, 0, 0, 0, 0, 0, 0, 0, 9, 8, 7])
    r = wire.ByteReader(b)
    assert r.rgb() == (9, 8, 7)


def test_rgb_stream_vectorized():
    px = np.array([[1, 2, 3], [250, 251, 252]], np.uint8)
    data = wire.rgb_stream_to_wire(px)
    assert data.size == 22
    assert bytes(data[:11]) == wire.pack_rgb(1, 2, 3)
    back = wire.wire_to_rgb_stream(data)
    assert np.array_equal(back, px)
    with pytest.raises(wire.WireError):
        bad = data.copy()
        bad[0] = 4
        wire.wire_to_rgb_stream(bad)


def test_i16_triplets():
    v = np.array([[-255, 0, 255], [1, -2, 3]], np.int16)
    data = wire.i16_triplets_to_wire(v)
    assert data.size == 12
    assert np.array_equal(wire.wire_to_i16_triplets(data, 2), v)


def test_byte_reader_eof():
    r = wire.ByteReader(b"\x01")
    assert r.u8() == 1
    with pytest.raises(wire.WireError):
        r.u8()
    assert r.try_u8() is None


# --- bit.rs test vectors ---


def test_bit_mask_0_to_9():
    # bit.rs:352-399
    expected = [0, 0b1, 0b11, 0b111, 0b1111, 0b11111, 0b111111, 0b1111111, 0xFF, 0xFF]
    for n, e in enumerate(expected):
        assert wire.bit_mask(n) == e


def test_nth_bit_both_orders():
    byte = 0b10110010
    assert [wire.nth_bit_lsb(byte, i) for i in range(8)] == [0, 1, 0, 0, 1, 1, 0, 1]
    assert [wire.nth_bit_msb(byte, i) for i in range(8)] == [1, 0, 1, 1, 0, 0, 1, 0]


def test_bitwriter_all_zero_and_ff():
    bw = wire.BitWriter()
    for _ in range(8):
        bw.write_bit(0)
    assert bw.getvalue() == bytes([0])
    bw = wire.BitWriter()
    for _ in range(8):
        bw.write_bit(1)
    assert bw.getvalue() == bytes([0xFF])


def test_bitwriter_interleaved_byte():
    # bit.rs:300-322: 0b010, 0xf0, 0b01100 -> 0x5e0c
    bw = wire.BitWriter()
    for b in (0, 1, 0):
        bw.write_bit(b)
    bw.write_byte(0xF0)
    for b in (0, 1, 1, 0, 0):
        bw.write_bit(b)
    assert bw.getvalue() == bytes([0x5E, 0x0C])


def test_bitwriter_mask():
    # bit.rs:324-349: 0b0000, 0b110, 0xff, 0b0 (+pad) -> 0x0dfe
    bw = wire.BitWriter()
    for b in (0, 0, 0, 0, 1, 1, 0):
        bw.write_bit(b)
    bw.write_byte(0xFF)
    bw.write_bit(0)
    bw.pad_and_flush()
    assert bw.getvalue() == bytes([0x0D, 0xFE])


def test_bitwriter_write_bits():
    bw = wire.BitWriter()
    bw.write_bits(0b010, 3)
    bw.write_bits(0xF0, 8)
    bw.write_bits(0b01100, 5)
    assert bw.getvalue() == bytes([0x5E, 0x0C])


def test_byte_from_bits():
    assert wire.byte_from_bits_msb([1, 1, 1, 1, 0, 0, 0, 0]) == 0xF0
    with pytest.raises(wire.WireError):
        wire.byte_from_bits_msb([1])


def test_dims_cap_symmetric_encode_decode():
    # decode side: untrusted u32s beyond the 2^27-pixel cap die as WireError
    big = wire.pack_u32(20000) + wire.pack_u32(20000)
    with pytest.raises(wire.WireError):
        wire.ByteReader(big).dims()
    zero = wire.pack_u32(0) + wire.pack_u32(5)
    with pytest.raises(wire.WireError):
        wire.ByteReader(zero).dims()
    # encode side mirrors it: no codec can emit a stream its own decoder
    # rejects (round-trip symmetry)
    with pytest.raises(ValueError):
        wire.pack_dims(20000, 20000)
    with pytest.raises(ValueError):
        wire.pack_dims(0, 5)
    # the cap itself is inclusive
    w, h = 1 << 14, 1 << 13
    assert wire.ByteReader(wire.pack_dims(w, h)).dims() == (w, h)
