"""Core-14 AFM width fallback (reference font/index.ts:389-411)."""
import pytest

from pdfi_spark.core.afm import AFM_DEFAULT_WIDTH, CORE14_WIDTHS
from pdfi_spark.core.api import read_pdf
from pdfi_spark.core.fonts import Type1Font
from pdfi_spark.core.pdfgen import ORACLE_PER_BLOCK, build_pdf


def _font_for(base_font: str) -> Type1Font:
    return Type1Font(None, {
        "Type": "Font", "Subtype": "Type1", "BaseFont": base_font,
    })


def test_all_14_fonts_present():
    assert len(CORE14_WIDTHS) == 14
    for name in ("Helvetica", "Helvetica-Bold", "Helvetica-Oblique",
                 "Helvetica-BoldOblique", "Times-Roman", "Times-Bold",
                 "Times-Italic", "Times-BoldItalic", "Courier",
                 "Courier-Bold", "Courier-Oblique", "Courier-BoldOblique",
                 "Symbol", "ZapfDingbats"):
        assert name in CORE14_WIDTHS


def test_helvetica_measure_exact():
    font = _font_for("Helvetica")
    # H=722 e=556 l=222 l=222 o=556 (Helvetica.afm)
    assert font.measure(b"Hello") == 722 + 556 + 222 + 222 + 556
    assert font.measure(b" ") == 278


def test_times_roman_measure_exact():
    font = _font_for("Times-Roman")
    # W=944 i=278 d=500 e=444 (Times-Roman.afm)
    assert font.measure(b"Wide") == 944 + 278 + 500 + 444
    assert font.measure(b" ") == 250


def test_oblique_variants_share_upright_widths():
    assert CORE14_WIDTHS["Helvetica-Oblique"] == CORE14_WIDTHS["Helvetica"]
    assert CORE14_WIDTHS["Times-Roman"] != CORE14_WIDTHS["Times-Bold"]


def test_courier_is_fixed_pitch():
    font = _font_for("Courier-BoldOblique")
    assert font.measure(b"iiii") == 4 * 600
    assert font.measure(b"WWWW") == 4 * 600


def test_comma_suffixed_basefont_resolves():
    # reference splits BaseFont on ',' (font/index.ts:380)
    font = _font_for("Helvetica,Bold-ish")
    assert font.measure(b"H") == 722


def test_unknown_glyph_gets_afm_default():
    font = _font_for("Helvetica")
    # code 1 maps to no Standard glyph -> default width 1000
    assert font.measure(b"\x01") == AFM_DEFAULT_WIDTH


def test_composites_share_base_advance():
    helv = CORE14_WIDTHS["Helvetica"]
    assert helv["Aacute"] == helv["A"] == 667
    assert helv["udieresis"] == helv["u"] == 556
    assert helv["iacute"] == helv["dotlessi"] == 278


def test_non_core14_without_widths_still_raises():
    font = _font_for("SomeEmbeddedFont")
    with pytest.raises(ValueError):
        font.measure(b"x")


def test_core14_nowidths_recipe_roundtrip():
    for text in ("alpha beta gamma", "tiny", "word " * 40):
        pdf, expected = build_pdf(
            text.strip(), "core14_nowidths", per_block=ORACLE_PER_BLOCK
        )
        assert read_pdf(pdf, type="string") == expected


def test_zapf_dingbats_full_table():
    zapf = CORE14_WIDTHS["ZapfDingbats"]
    # spot values straight from the public ZapfDingbats.afm
    assert zapf["space"] == 278
    assert zapf["a1"] == 974      # scissors
    assert zapf["a12"] == 939     # pointing hand
    assert zapf["a82"] == 138     # thin vertical bar (narrowest dingbat)
    assert zapf["a120"] == 788    # circled digit one
    assert zapf["a163"] == 1016   # widest arrow
    assert zapf["a191"] == 918    # last encoded dingbat
    assert all(zapf[f"a{n}"] == 788 for n in range(120, 160))
    # every existing aN name present: a80 and a113..a116 do not exist in
    # the Adobe AFM; everything else in a1..a206 does
    missing = {80, 113, 114, 115, 116}
    for n in range(1, 207):
        assert (f"a{n}" in zapf) == (n not in missing), n


def test_zapf_dingbats_measure_via_differences():
    """Widths-less ZapfDingbats font with /Differences: codes mapped to
    AGL-decodable aN names measure at the real dingbat widths; codes
    mapped to names outside the AGL measure at the None-key catch-all
    (last non-AGL AFM entry = a96 -> 334), mirroring the reference's JS
    widthMapping[undefined] behavior (font/index.ts:402-408)."""
    font = Type1Font(None, {
        "Type": "Font", "Subtype": "Type1", "BaseFont": "ZapfDingbats",
        "Encoding": {
            "Type": "Encoding",
            "Differences": [128, "a1", "a49", "a100", "space"],
        },
    })
    # a1 -> U+25C1 (AGL) = 974; a49 -> U+22C8 (AGL) = 695
    assert font.measure(b"\x80\x81") == 974 + 695
    # a100 is NOT in the AGL -> decodes to None -> catch-all width 334
    assert font.measure(b"\x82") == 334
    assert font.measure(b"\x83") == 278


def test_symbol_extended_set():
    sym = CORE14_WIDTHS["Symbol"]
    # arrows, card suits, bracket pieces, florin (Symbol.afm)
    assert sym["arrowright"] == 987 and sym["arrowup"] == 603
    assert sym["club"] == sym["heart"] == sym["spade"] == sym["diamond"] == 753
    assert sym["parenlefttp"] == 384 and sym["bracerighttp"] == 494
    assert sym["florin"] == 500
    assert sym["integral"] == 274 and sym["radical"] == 549
    assert sym["Euro"] == 750 and sym["apple"] == 790


def test_zapf_recipe_roundtrip():
    for text in ("alpha beta gamma pack my box", "tiny", "word " * 40):
        pdf, expected = build_pdf(
            text.strip(), "zapf_dingbats", per_block=ORACLE_PER_BLOCK
        )
        assert read_pdf(pdf, type="string") == expected


def test_fontmatrix_width_multiplier():
    """FontMatrix[0]/0.001 scales Widths (reference font/index.ts:383-386,
    technically a Type3 concern but honored for any Type1-path font)."""
    font = Type1Font(None, {
        "Type": "Font", "Subtype": "Type1", "BaseFont": "Anything",
        "FirstChar": 65, "Widths": [700, 800], "FontMatrix": [0.002, 0, 0, 0.002, 0, 0],
    })
    assert font.measure(b"A") == 700 * 2
    assert font.measure(b"B") == 800 * 2
