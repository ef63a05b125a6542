"""Byte-buffer cursor used by all parsers.

Replaces the reference's lexing.BufferIterator / PDFSourceBufferIterator
(/root/reference/parsers/index.ts:20-32). Because every document payload
arrives as one in-memory ``bytes`` cell of an Arrow batch, a zero-copy
(data, pos) cursor is both simpler and faster than the reference's
1024-byte peek windows — regexes match directly at ``pos``.
"""
from __future__ import annotations


class Buf:
    """A cursor over an immutable bytes object."""

    __slots__ = ("data", "pos", "resolve")

    def __init__(self, data: bytes, pos: int = 0, resolve=None):
        self.data = data
        self.pos = pos
        # `resolve` is the "stream hack" (reference parsers/states.ts:253-267):
        # a callable mapping an indirect-reference dict -> object, needed when
        # a stream's /Length is an indirect reference.
        self.resolve = resolve

    def peek(self, n: int) -> bytes:
        return self.data[self.pos:self.pos + n]

    def next(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def skip(self, n: int) -> None:
        self.pos += n

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


class ParseError(Exception):
    """Raised when no grammar rule matches (reference parsers/machine.ts:61-64)."""

    def __init__(self, state: str, data: bytes, pos: int):
        snippet = data[pos:pos + 128]
        super().__init__(
            f'Invalid language; could not find a match in input {snippet!r} for state "{state}"'
        )
        self.state = state
        self.pos = pos


def rfind(data: bytes, needle: bytes) -> int:
    """Backward scan, reference PDF.ts:33-36 (lexing lastIndexOf)."""
    return data.rfind(needle)
