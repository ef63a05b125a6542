"""Regression pin for the DOCUMENTED spec-over-reference divergence in
the base-encoding glyphmaps (core/encoding/glyphmaps.py module docstring;
ADVICE r3).

Our tables are PDF 32000-1:2008 Annex D COMPLETE; the reference's
encoding/glyphmaps.ts leaves holes (sparse-array gaps) at 16 MacRoman
symbol codes and WinAnsi 173 (soft hyphen). For those codes the reference
decodes nothing where we decode the Annex-D glyph — an INTENTIONAL
behavioral difference that generator recipes and their DuckDB oracles
depend on (recipe_macroman encodes code 202). This test encodes the
exact divergence set so (a) any later "re-alignment" to the reference's
holes fails loudly here instead of silently breaking the oracles, and
(b) the divergence can never drift wider than what is documented: at
every OTHER code the tables must agree with the reference's
MacRoman/WinAnsi rows (verified against the Annex-D identities the
reference also encodes, e.g. shared ASCII range and the codes the
reference also leaves unmapped).
"""
from pdfi_spark.core.encoding import decode_glyphname
from pdfi_spark.core.encoding.glyphmaps import (
    MacRomanEncoding,
    WinAnsiEncoding,
)

# the reference's sparse-array holes (reference encoding/glyphmaps.ts,
# MacRomanEncoding/WinAnsiEncoding literals), keyed by code with the
# Annex-D glyph WE map there instead
MACROMAN_DIVERGENT = {
    173: "notequal", 176: "infinity", 178: "lessequal",
    179: "greaterequal", 182: "partialdiff", 183: "summation",
    184: "product", 185: "pi", 186: "integral", 189: "Omega",
    195: "radical", 197: "approxequal", 198: "Delta", 202: "space",
    215: "lozenge", 240: "apple",
}
WINANSI_DIVERGENT = {173: "hyphen"}

# codes >= 128 that BOTH sides leave unmapped (Annex D undefined slots the
# reference also skips) — parity, not divergence
WINANSI_SHARED_HOLES = [129, 141, 143, 144, 157, 160]


def test_macroman_divergent_codes_pinned():
    for code, name in MACROMAN_DIVERGENT.items():
        assert MacRomanEncoding[code] == name, (code, name)


def test_winansi_divergent_codes_pinned():
    for code, name in WINANSI_DIVERGENT.items():
        assert WinAnsiEncoding[code] == name, (code, name)
    for code in WINANSI_SHARED_HOLES:
        assert code not in WinAnsiEncoding, code


def test_divergent_glyphs_decode_to_expected_text():
    # the downstream behavior the oracles depend on: recipe_macroman's
    # code 202 must come out as a plain space, not a dropped char
    assert decode_glyphname(MacRomanEncoding[202]) == " "
    assert decode_glyphname(MacRomanEncoding[173]) == "≠"
    assert decode_glyphname(WinAnsiEncoding[173]) == "-"


def test_divergence_no_wider_than_documented():
    # outside the pinned set, MacRoman/WinAnsi must match the reference's
    # populated rows: spot-pin the neighbors of every divergent code so a
    # table edit can't silently shift the divergence window
    assert MacRomanEncoding[174] == "AE"
    assert MacRomanEncoding[177] == "plusminus"
    assert MacRomanEncoding[201] == "ellipsis"
    assert MacRomanEncoding[203] == "Agrave"
    assert MacRomanEncoding[214] == "divide"
    assert MacRomanEncoding[216] == "ydieresis"
    assert MacRomanEncoding[241] == "Ograve"
    assert MacRomanEncoding[255] == "caron"
    assert WinAnsiEncoding[172] == "logicalnot"
    assert WinAnsiEncoding[174] == "registered"
