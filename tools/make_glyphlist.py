"""One-off generator for pdfi_spark/core/encoding/glyphlist_data.py.

Extracts the full Adobe Glyph List table (public Adobe data, also shipped
by the reference at /root/reference/encoding/glyphlist.ts:1-5075) and
re-emits it as a packed ASCII string: one `name=HEX[,HEX...]` record per
entry, ';'-joined, wrapped for readability. The packed form is decoded at
import time by glyphlist.py; codepoints-as-hex keeps the committed file
pure ASCII and diff-stable.

Usage: python tools/make_glyphlist.py [path-to-glyphlist.ts]
"""
from __future__ import annotations

import json
import sys

SRC_DEFAULT = "/root/reference/encoding/glyphlist.ts"
OUT = "pdfi_spark/core/encoding/glyphlist_data.py"
WRAP = 96


def main() -> int:
    src_path = sys.argv[1] if len(sys.argv) > 1 else SRC_DEFAULT
    src = open(src_path, encoding="utf-8").read()
    body = src[src.index("{"): src.rindex("}") + 1]
    table: dict[str, str] = json.loads(body)

    records = []
    for name in sorted(table):
        value = table[name]
        codes = ",".join(format(ord(c), "X") for c in value)
        assert "=" not in name and ";" not in name, name
        records.append(f"{name}={codes}")
    packed = ";".join(records)

    lines = [packed[i:i + WRAP] for i in range(0, len(packed), WRAP)]
    joined = "\n".join(f'    "{line}"' for line in lines)
    with open(OUT, "w", encoding="ascii") as f:
        f.write(
            '"""Packed Adobe Glyph List: %d glyph-name -> Unicode entries.\n'
            "\n"
            "Public Adobe data (the AGL, plus the extra TeX/dingbat names the\n"
            "reference bundles -- /root/reference/encoding/glyphlist.ts:1-5075).\n"
            "Format: ';'-separated `name=HEX[,HEX...]` records (UTF-16-free:\n"
            "each HEX is a full Unicode codepoint). Regenerate with\n"
            "`python tools/make_glyphlist.py`; decoded by glyphlist.py.\n"
            '"""\n\nPACKED_AGL = (\n%s\n)\n' % (len(table), joined)
        )
    print(f"wrote {OUT}: {len(table)} entries, {len(lines)} lines")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
