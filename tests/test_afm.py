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


def test_fontmatrix_width_multiplier():
    """FontMatrix[0]/0.001 scales Widths (reference font/index.ts:383-386,
    technically a Type3 concern but honored for any Type1-path font)."""
    font = Type1Font(None, {
        "Type": "Font", "Subtype": "Type1", "BaseFont": "Anything",
        "FirstChar": 65, "Widths": [700, 800], "FontMatrix": [0.002, 0, 0, 0.002, 0, 0],
    })
    assert font.measure(b"A") == 700 * 2
    assert font.measure(b"B") == 800 * 2
