"""Golden tests ported from /root/reference/test/filters.ts (9 cases),
plus flate-predictor coverage for the xref-stream path."""
import zlib

from pdfi_spark.core.filters import (
    BitIterator,
    apply_filters,
    ascii85_decode,
    asciihex_decode,
    flate_decode,
    lzw_decode,
)


def test_ascii85_decode_ascii_string():
    assert ascii85_decode(b"87cURD]j7BEbo80") == b"Hello world!"


def test_ascii85_decode_with_eof_marker():
    assert ascii85_decode(b"87cURD]j7BEbo80~>") == b"Hello world!"


def test_ascii85_decode_0xff_bytes():
    assert ascii85_decode(b"s8W-!") == bytes([255, 255, 255, 255])


def test_ascii85_decode_random_buffer_12():
    assert ascii85_decode(b"%V'A!!<ZDmrr") == bytes([14, 99, 109, 203, 1, 3, 87, 155, 255])


def test_ascii85_decode_random_buffer_5():
    assert ascii85_decode(b"a9ZHD") == bytes([200, 8, 104, 63])


def test_ascii85_decode_leviathan():
    text = "\n".join([
        "9jqo^BlbD-BleB1DJ+*+F(f,q/0JhKF<GL>Cj@.4Gp$d7F!,L7@<6@)/0JDEF<G%<+EV:2F!,",
        'O<DJ+*.@<*K0@<6L(Df-\\0Ec5e;DffZ(EZee.Bl.9pF"AGXBPCsi+DGm>@3BB/F*&OCAfu2/AKY',
        "i(DIb:@FD,*)+C]U=@3BN#EcYf8ATD3s@q?d$AftVqCh[NqF<G:8+EV:.+Cf>-FD5W8ARlolDIa",
        "l(DId<j@<?3r@:F%a+D58'ATD4$Bl@l3De:,-DJs`8ARoFb/0JMK@qB4^F!,R<AKZ&-DfTqBG%G",
        ">uD.RTpAKYo'+CT/5+Cei#DII?(E,9)oF*2M7/c",
    ])
    expected = (
        b"Man is distinguished, not only by his reason, but by this singular "
        b"passion from other animals, which is a lust of the mind, that by a "
        b"perseverance of delight in the continued and indefatigable generation "
        b"of knowledge, exceeds the short vehemence of any carnal pleasure."
    )
    assert ascii85_decode(text.encode("ascii")) == expected


def test_bit_iterator():
    bits = BitIterator(bytes([0x8F, 0x67]))
    assert [bits.next(9), bits.next(2), bits.next(5)] == [286, 3, 7]


def test_bit_iterator_9bit_stream():
    bits = BitIterator(bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01]))
    actual = []
    while bits.length > bits.offset:
        actual.append(bits.next(9))
    assert actual == [256, 45, 258, 258, 65, 259, 66, 257]


def test_lzw_decode_spec_example():
    encoded = bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])
    assert lzw_decode(encoded) == bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])


def test_asciihex_decode():
    assert asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"


def test_flate_roundtrip():
    raw = b"BT (hi) Tj ET" * 10
    assert flate_decode(zlib.compress(raw)) == raw


def test_flate_up_predictor():
    # rows of 3 columns, PNG Up predictor (filter byte 2 per row)
    rows = [b"\x02\x01\x02\x03", b"\x02\x01\x01\x01", b"\x02\xff\x00\x01"]
    raw = zlib.compress(b"".join(rows))
    decoded = flate_decode(raw, {"Predictor": 12, "Columns": 3})
    # row0 = 1,2,3; row1 = row0 + (1,1,1) = 2,3,4; row2 = row1 + (255,0,1) = 1,3,5 (mod 256)
    assert decoded == bytes([1, 2, 3, 2, 3, 4, 1, 3, 5])


def test_apply_filters_chain_and_unknown():
    raw = b"payload"
    data = zlib.compress(raw)
    assert apply_filters(data, ["FlateDecode"]) == raw
    try:
        apply_filters(raw, ["DCTDecode"])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_lzw_truncated_stream_raises_contained_error():
    # a stream cut mid-code (or missing its EOD) must raise — mirroring
    # the reference's Buffer.readUIntBE RangeError — rather than
    # fabricating a code from a short byte slice; read_pdf contains the
    # raise as an error row upstream
    import pytest as _pytest

    from pdfi_spark.core.filters import BitIterator, lzw_decode

    bits = BitIterator(b"\x80")
    with _pytest.raises(ValueError):
        bits.peek(9)
    # 9 valid bits for one literal, then 7 dangling bits: the next code
    # read crosses the end
    with _pytest.raises(ValueError):
        lzw_decode(b"\x80\x40")
