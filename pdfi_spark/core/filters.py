"""PDF stream filters (reference /root/reference/filters/decoders.ts).

Supported: FlateDecode (+ PNG Up predictor 12), LZWDecode, ASCII85Decode,
ASCIIHexDecode. Unknown filters raise, matching applyFilters
(decoders.ts:375-386). CCITTFax/JBIG2/DCT/JPX/Crypt are intentionally
unimplemented, as in the reference (decoders.ts:16-28).
"""
from __future__ import annotations

import zlib

import numpy as np


def flate_decode(buffer: bytes, decode_parms=None) -> bytes:
    """zlib inflate; applies the PNG "Up" predictor when
    DecodeParms = {Predictor: 12, Columns: N} (decoders.ts:212-235).

    The Up predictor is a per-column cumulative byte sum over rows —
    vectorized here with a wrapping uint8 accumulate instead of the
    reference's scalar double loop.
    """
    inflated = zlib.decompress(buffer)
    if decode_parms and decode_parms.get("Predictor") and decode_parms.get("Columns"):
        predictor = decode_parms["Predictor"]
        if predictor != 12:
            raise ValueError(f'Unsupported DecodeParms.Predictor value: "{predictor}"')
        columns = int(decode_parms["Columns"])
        rows = len(inflated) // (columns + 1)
        raw = np.frombuffer(inflated[: rows * (columns + 1)], dtype=np.uint8)
        raw = raw.reshape(rows, columns + 1)[:, 1:]  # drop per-row filter byte
        decoded = np.add.accumulate(raw, axis=0, dtype=np.uint8)
        return decoded.tobytes()
    return inflated


def ascii85_decode(data: bytes, decode_parms=None) -> bytes:
    """Base-85 with 'z' zero groups, '~>' EOF, whitespace skipping and
    partial-group 'u' padding (decoders.ts:38-154). stdlib a85decode is not
    used because it requires stricter framing than the reference accepts.
    """
    out = bytearray()
    group = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b == 0x7E and i < n and data[i] == 0x3E:  # ~>
            i += 1
            if i < n:
                raise ValueError("EOF marker (~>) reached before the end of the input")
            break
        if b in (0x09, 0x0A, 0x0D, 0x20):
            continue
        if b == 0x7A:  # z
            if group:
                raise ValueError('The "z" character cannot occur in the middle of a group')
            out.extend(b"\x00\x00\x00\x00")
            continue
        group.append(b)
        if len(group) == 5:
            _flush_a85_group(group, out)
            group = []
    if group:
        _flush_a85_group(group, out)
    return bytes(out)


def _flush_a85_group(group, out: bytearray) -> None:
    k = len(group)
    padded = group + [117] * (5 - k)  # pad with 'u'
    total = 0
    for c in padded:
        total = total * 85 + (c - 33)
    quad = total.to_bytes(5, "big")[-4:] if total > 0xFFFFFFFF else total.to_bytes(4, "big")
    out.extend(quad[: k - 1])


def asciihex_decode(data: bytes, decode_parms=None) -> bytes:
    """Hex pairs with whitespace skip and '>' EOF (decoders.ts:163-210).

    Note: for an odd number of digits the reference pads with a NUL
    *character*, so parseInt("A\\x00", 16) == 0xA — i.e. the final lone
    digit becomes the low nibble, not the high one as the PDF spec says.
    We reproduce the reference behavior for byte-identity.
    """
    out = bytearray()
    pending = []
    for b in data:
        if b == 0x3E:  # >
            break
        if b in (0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20):
            continue
        pending.append(b)
        if len(pending) == 2:
            out.append(int(bytes(pending), 16))
            pending = []
    if pending:
        out.append(int(bytes(pending), 16))  # lone digit -> its own value
    return bytes(out)


class BitIterator:
    """MSB-first bit reader (decoders.ts:237-279)."""

    def __init__(self, buffer: bytes):
        self.buffer = buffer
        self.offset = 0
        self.length = len(buffer) * 8

    def peek(self, n: int) -> int:
        if self.offset + n > self.length:
            # the reference's Buffer.readUIntBE throws RangeError here
            # (truncated / EOD-less stream); a silent short slice would
            # fabricate a code from the dropped low bytes instead
            raise ValueError("LZW: bit read past end of data")
        start = self.offset // 8
        end = -(-(self.offset + n) // 8)  # ceil
        uint = int.from_bytes(self.buffer[start:end], "big")
        byte_length = end - start
        base = uint >> (byte_length * 8 - ((self.offset % 8) + n))
        return base & ((1 << n) - 1)

    def next(self, n: int) -> int:
        code = self.peek(n)
        self.offset += n
        return code


def lzw_decode(buffer: bytes, decode_parms=None) -> bytes:
    """9->12-bit variable-code LZW with clear (256) / EOD (257) markers
    (decoders.ts:302-366). Literal codes are 0..255 inclusive (the
    reference's ``code < 255`` comparison mis-handles the 0xFF literal;
    we use the spec-correct inclusive bound).
    """
    bits = BitIterator(buffer)
    chunks = []
    table: dict[int, bytes] = {}
    table_max = 257
    code_length = 9
    while bits.length > bits.offset:
        code = bits.next(code_length)
        if code == 256:
            table = {}
            table_max = 257
            code_length = 9
        elif code == 257:
            break
        else:
            table_index = table_max + 1
            if table_index in (511, 1023, 2047):
                code_length += 1
            output_chunk = bytes([code]) if code <= 255 else table[code]
            chunks.append(output_chunk)
            next_code = bits.peek(code_length)
            if next_code in (256, 257):
                next_prefix = 0
            elif next_code > table_max:
                next_prefix = output_chunk[0]
            elif next_code > 257:
                next_prefix = table[next_code][0]
            else:
                next_prefix = next_code
            table[table_index] = output_chunk + bytes([next_prefix])
            table_max += 1
    return b"".join(chunks)


DECODERS = {
    "FlateDecode": flate_decode,
    "LZWDecode": lzw_decode,
    "ASCII85Decode": ascii85_decode,
    "ASCIIHexDecode": asciihex_decode,
}


def apply_filters(buffer: bytes, filters: list, decode_parmss: list | None = None) -> bytes:
    """Apply the /Filter chain in order (decoders.ts:375-386)."""
    decode_parmss = decode_parmss or []
    for i, name in enumerate(filters):
        decoder = DECODERS.get(name)
        if decoder is None:
            raise ValueError(f'Could not find decoder named "{name}" to fully decode stream')
        parms = decode_parmss[i] if i < len(decode_parmss) else None
        buffer = decoder(buffer, parms)
    return buffer
