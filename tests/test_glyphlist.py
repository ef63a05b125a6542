"""Full Adobe Glyph List coverage (reference encoding/glyphlist.ts)."""
import json
import os

import pytest

from pdfi_spark.core.api import read_pdf
from pdfi_spark.core.encoding import decode_glyphname
from pdfi_spark.core.encoding.glyphlist import GLYPHLIST
from pdfi_spark.core.pdfgen import ORACLE_PER_BLOCK, build_pdf

REFERENCE_TS = "/root/reference/encoding/glyphlist.ts"


def test_agl_entry_count():
    # the reference bundles 5,073 names (AGL + TeX + dingbat extensions)
    assert len(GLYPHLIST) == 5073


def test_agl_spot_values():
    # Greek / Cyrillic / Hebrew / math / dingbat / smallcap-PUA families
    assert GLYPHLIST["alpha"] == "α"
    assert GLYPHLIST["afii10017"] == "А"
    assert GLYPHLIST["alef"] == "א"
    assert GLYPHLIST["partialdiff"] == "∂"
    assert GLYPHLIST["a1"] == "◁"
    assert GLYPHLIST["Asmall"] == ""
    # AGL maps Omega to OHM SIGN (NFKC later folds it to U+03A9)
    assert GLYPHLIST["Omega"] == "Ω"
    # multi-char ligature expansion
    assert GLYPHLIST["ffi"] == "ﬃ"
    assert GLYPHLIST["FFIsmall"] == ""


@pytest.mark.skipif(not os.path.exists(REFERENCE_TS), reason="reference absent")
def test_agl_parity_with_reference_table():
    src = open(REFERENCE_TS, encoding="utf-8").read()
    ref = json.loads(src[src.index("{"): src.rindex("}") + 1])
    assert GLYPHLIST == ref


def test_decode_glyphname_prefers_table_over_uni_convention():
    assert decode_glyphname("alpha") == "α"
    assert decode_glyphname("uni0041") == "A"
    assert decode_glyphname(".notdef") is None
    assert decode_glyphname("nosuchglyphname") is None


def test_glyphnames_recipe_roundtrip():
    pdf, expected = build_pdf(
        "the quick brown fox jumps over a lazy dog 42 X!",
        "glyphnames",
        per_block=ORACLE_PER_BLOCK,
    )
    assert read_pdf(pdf, type="string") == expected
    # the expected text really went through non-Latin glyph names
    assert "α" in expected and "А" in expected
