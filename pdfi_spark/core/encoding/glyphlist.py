"""Glyph name -> Unicode string table: the FULL Adobe Glyph List.

Public Adobe data (AGL), matching the table the reference bundles at
/root/reference/encoding/glyphlist.ts:1-5075 entry-for-entry (5,073
names, including the TeX extension names like `angbracketleftbig`, the
ZapfDingbats `a1`..`a191` names, and `Xsmall` smallcap PUA mappings).
Shipped packed in glyphlist_data.py (name=HEX[,HEX...] records) and
decoded once at import; names outside the table fall back to the
uniXXXX / charXX conventions handled by decode_glyphname
(reference encoding/index.ts:135-172).
"""
from .glyphlist_data import PACKED_AGL


def _unpack(packed: str) -> dict[str, str]:
    table: dict[str, str] = {}
    for record in packed.split(";"):
        name, _, codes = record.partition("=")
        table[name] = "".join(chr(int(c, 16)) for c in codes.split(","))
    return table


GLYPHLIST: dict[str, str] = _unpack(PACKED_AGL)
