"""Core-14 font metrics (public Adobe AFM width data).

The reference falls back to the `afm` package's parsed Core-14 AFM files
when a Type1 font has no /Widths (reference font/index.ts:389-411):
``widthMapping[glyphlist[charMetrics.name]] = charMetrics.width`` with
``defaultWidth = 1000``. This module ships the same public width tables,
transcribed from the Adobe Core-14 AFM files:

- full ASCII coverage (glyphs for codes 32..126) for all 14 fonts;
- the ISO-Adobe extended set (ligatures, quotes, currency, accents,
  AE/OE/oslash families) for the 12 text fonts;
- accented composites (Aacute, ugrave, ...) derive their width from the
  base glyph, exactly as the AFM ``CC`` composite definitions do;
- Courier variants are fixed-pitch 600 across the whole charset;
- Symbol ships its full Greek/operator set; ZapfDingbats ships `space`
  only (its a1..a191 widths are omitted — unmapped dingbats measure at
  the 1000 default, and dingbat extraction is presentation-only).

Glyphs outside these tables measure at the 1000 default width, matching
the reference's behavior for names its AGL lookup misses.
"""
from __future__ import annotations

# glyph names for ASCII codes 32..126 (AFM char-metric names; both the
# typographic quoteright/quoteleft and the literal quotesingle/grave
# appear in the AFMs — the ASCII list uses the literal forms, the
# typographic forms live in the extras)
_ASCII_NAMES = (
    "space exclam quotedbl numbersign dollar percent ampersand quotesingle "
    "parenleft parenright asterisk plus comma hyphen period slash "
    "zero one two three four five six seven eight nine "
    "colon semicolon less equal greater question at "
    "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    "bracketleft backslash bracketright asciicircum underscore grave "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
).split()

# composite -> base glyph (AFM CC definitions share the base advance);
# i-composites sit on dotlessi, Eth/Thorn share D/P, eth/thorn share o/p
_COMPOSITES = {
    "Agrave": "A", "Aacute": "A", "Acircumflex": "A", "Atilde": "A",
    "Adieresis": "A", "Aring": "A", "Ccedilla": "C",
    "Egrave": "E", "Eacute": "E", "Ecircumflex": "E", "Edieresis": "E",
    "Igrave": "I", "Iacute": "I", "Icircumflex": "I", "Idieresis": "I",
    "Ntilde": "N",
    "Ograve": "O", "Oacute": "O", "Ocircumflex": "O", "Otilde": "O",
    "Odieresis": "O",
    "Ugrave": "U", "Uacute": "U", "Ucircumflex": "U", "Udieresis": "U",
    "Yacute": "Y", "Ydieresis": "Y", "Scaron": "S", "Zcaron": "Z",
    "Eth": "D", "Thorn": "P",
    "agrave": "a", "aacute": "a", "acircumflex": "a", "atilde": "a",
    "adieresis": "a", "aring": "a", "ccedilla": "c",
    "egrave": "e", "eacute": "e", "ecircumflex": "e", "edieresis": "e",
    "igrave": "dotlessi", "iacute": "dotlessi", "icircumflex": "dotlessi",
    "idieresis": "dotlessi", "ntilde": "n",
    "ograve": "o", "oacute": "o", "ocircumflex": "o", "otilde": "o",
    "odieresis": "o",
    "ugrave": "u", "uacute": "u", "ucircumflex": "u", "udieresis": "u",
    "yacute": "y", "ydieresis": "y", "scaron": "s", "zcaron": "z",
    "eth": "o", "thorn": "p",
}


def _parse(pairs: str) -> dict[str, int]:
    toks = pairs.split()
    return {toks[i]: int(toks[i + 1]) for i in range(0, len(toks), 2)}


def _font(ascii_widths: list[int], extras: str) -> dict[str, int]:
    d = dict(zip(_ASCII_NAMES, ascii_widths, strict=True))
    d.update(_parse(extras))
    for comp, base in _COMPOSITES.items():
        if base in d:
            d.setdefault(comp, d[base])
    return d


_HELVETICA_ASCII = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    278, 278, 584, 584, 584, 556, 1015,
    667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833, 722,
    778, 667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611,
    278, 278, 278, 469, 556, 333,
    556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833, 556,
    556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500,
    334, 260, 334, 584,
]
_HELVETICA_EXTRAS = """
quoteleft 222 quoteright 222 quotedblleft 333 quotedblright 333
quotesinglbase 222 quotedblbase 333 guillemotleft 556 guillemotright 556
guilsinglleft 333 guilsinglright 333 endash 556 emdash 1000 bullet 350
dagger 556 daggerdbl 556 ellipsis 1000 perthousand 1000 fi 500 fl 500
florin 556 fraction 167 cent 556 sterling 556 yen 556 section 556
currency 556 paragraph 537 periodcentered 278 exclamdown 333
questiondown 611 AE 1000 ae 889 OE 1000 oe 944 Oslash 778 oslash 611
germandbls 611 Lslash 556 lslash 222 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 caron 333 breve 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

_HELVETICA_BOLD_ASCII = [
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278, 333,
    278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    333, 333, 584, 584, 584, 611, 975,
    722, 722, 722, 722, 667, 611, 778, 722, 278, 556, 722, 611, 833, 722,
    778, 667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611,
    333, 278, 333, 584, 556, 333,
    556, 611, 556, 611, 556, 333, 611, 611, 278, 278, 556, 278, 889, 611,
    611, 611, 611, 389, 556, 333, 611, 556, 778, 556, 556, 500,
    389, 280, 389, 584,
]
_HELVETICA_BOLD_EXTRAS = """
quoteleft 278 quoteright 278 quotedblleft 500 quotedblright 500
quotesinglbase 278 quotedblbase 500 guillemotleft 556 guillemotright 556
guilsinglleft 333 guilsinglright 333 endash 556 emdash 1000 bullet 350
dagger 556 daggerdbl 556 ellipsis 1000 perthousand 1000 fi 611 fl 611
florin 556 fraction 167 cent 556 sterling 556 yen 556 section 556
currency 556 paragraph 556 periodcentered 278 exclamdown 333
questiondown 611 AE 1000 ae 889 OE 1000 oe 944 Oslash 778 oslash 611
germandbls 611 Lslash 611 lslash 278 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 caron 333 breve 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

_TIMES_ASCII = [
    250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333,
    250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
    278, 278, 564, 564, 564, 444, 921,
    722, 667, 667, 722, 611, 556, 722, 722, 333, 389, 722, 611, 889, 722,
    722, 556, 722, 667, 556, 611, 722, 722, 944, 722, 722, 611,
    333, 278, 333, 469, 500, 333,
    444, 500, 444, 500, 444, 333, 500, 500, 278, 278, 500, 278, 778, 500,
    500, 500, 500, 333, 389, 278, 500, 500, 722, 500, 500, 444,
    480, 200, 480, 541,
]
_TIMES_EXTRAS = """
quoteleft 333 quoteright 333 quotedblleft 444 quotedblright 444
quotesinglbase 333 quotedblbase 444 guillemotleft 500 guillemotright 500
guilsinglleft 333 guilsinglright 333 endash 500 emdash 1000 bullet 350
dagger 500 daggerdbl 500 ellipsis 1000 perthousand 1000 fi 556 fl 556
florin 500 fraction 167 cent 500 sterling 500 yen 500 section 500
currency 500 paragraph 453 periodcentered 250 exclamdown 333
questiondown 444 AE 889 ae 667 OE 889 oe 722 Oslash 722 oslash 500
germandbls 500 Lslash 611 lslash 278 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 caron 333 breve 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

_TIMES_BOLD_ASCII = [
    250, 333, 555, 500, 500, 1000, 833, 278, 333, 333, 500, 570, 250, 333,
    250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
    333, 333, 570, 570, 570, 500, 930,
    722, 667, 722, 722, 667, 611, 778, 778, 389, 500, 778, 667, 944, 722,
    778, 611, 778, 722, 556, 667, 722, 722, 1000, 722, 722, 667,
    333, 278, 333, 581, 500, 333,
    500, 556, 444, 556, 444, 333, 500, 556, 278, 333, 556, 278, 833, 556,
    500, 556, 556, 444, 389, 333, 556, 500, 722, 500, 500, 444,
    394, 220, 394, 520,
]
_TIMES_BOLD_EXTRAS = """
quoteleft 333 quoteright 333 quotedblleft 500 quotedblright 500
quotesinglbase 333 quotedblbase 500 guillemotleft 500 guillemotright 500
guilsinglleft 333 guilsinglright 333 endash 500 emdash 1000 bullet 350
dagger 500 daggerdbl 500 ellipsis 1000 perthousand 1000 fi 556 fl 556
florin 500 fraction 167 cent 500 sterling 500 yen 500 section 500
currency 500 paragraph 540 periodcentered 250 exclamdown 333
questiondown 500 AE 1000 ae 722 OE 1000 oe 722 Oslash 778 oslash 500
germandbls 556 Lslash 667 lslash 278 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 caron 333 breve 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

_TIMES_ITALIC_ASCII = [
    250, 333, 420, 500, 500, 833, 778, 214, 333, 333, 500, 675, 250, 333,
    250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
    333, 333, 675, 675, 675, 500, 920,
    611, 611, 667, 722, 611, 611, 722, 722, 333, 444, 667, 556, 833, 667,
    722, 611, 722, 611, 500, 556, 722, 611, 833, 611, 556, 556,
    389, 278, 389, 422, 500, 333,
    500, 500, 444, 500, 444, 278, 500, 500, 278, 278, 444, 278, 722, 500,
    500, 500, 500, 389, 389, 278, 500, 444, 667, 444, 444, 389,
    400, 275, 400, 541,
]
_TIMES_ITALIC_EXTRAS = """
quoteleft 333 quoteright 333 quotedblleft 556 quotedblright 556
quotesinglbase 333 quotedblbase 556 guillemotleft 500 guillemotright 500
guilsinglleft 333 guilsinglright 333 endash 500 emdash 889 bullet 350
dagger 500 daggerdbl 500 ellipsis 889 perthousand 1000 fi 500 fl 500
florin 500 fraction 167 cent 500 sterling 500 yen 500 section 500
currency 500 paragraph 523 periodcentered 250 exclamdown 389
questiondown 500 AE 889 ae 667 OE 944 oe 667 Oslash 722 oslash 500
germandbls 500 Lslash 556 lslash 278 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 caron 333 breve 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

_TIMES_BOLDITALIC_ASCII = [
    250, 389, 555, 500, 500, 833, 778, 278, 333, 333, 500, 570, 250, 333,
    250, 278,
    500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
    333, 333, 570, 570, 570, 500, 832,
    667, 667, 667, 722, 667, 667, 722, 778, 389, 500, 667, 611, 889, 722,
    722, 611, 722, 667, 556, 611, 722, 667, 889, 667, 611, 611,
    333, 278, 333, 570, 500, 333,
    500, 500, 444, 500, 444, 333, 500, 556, 278, 278, 500, 278, 778, 556,
    500, 500, 500, 389, 389, 278, 556, 444, 667, 500, 444, 389,
    348, 220, 348, 570,
]
_TIMES_BOLDITALIC_EXTRAS = """
quoteleft 333 quoteright 333 quotedblleft 500 quotedblright 500
quotesinglbase 333 quotedblbase 500 guillemotleft 500 guillemotright 500
guilsinglleft 333 guilsinglright 333 endash 500 emdash 1000 bullet 350
dagger 500 daggerdbl 500 ellipsis 1000 perthousand 1000 fi 556 fl 556
florin 500 fraction 167 cent 500 sterling 500 yen 500 section 500
currency 500 paragraph 500 periodcentered 250 exclamdown 389
questiondown 500 AE 944 ae 722 OE 944 oe 722 Oslash 722 oslash 500
germandbls 500 Lslash 611 lslash 278 dotlessi 278
acute 333 dieresis 333 macron 333 cedilla 333 breve 333 caron 333
circumflex 333 tilde 333 ring 333 hungarumlaut 333 ogonek 333 dotaccent 333
"""

# Courier: fixed pitch — every glyph in the charset advances 600
_COURIER = _font([600] * len(_ASCII_NAMES), " ".join(
    f"{name} 600" for name in (
        "quoteleft quoteright quotedblleft quotedblright quotesinglbase "
        "quotedblbase guillemotleft guillemotright guilsinglleft "
        "guilsinglright endash emdash bullet dagger daggerdbl ellipsis "
        "perthousand fi fl florin fraction cent sterling yen section "
        "currency paragraph periodcentered exclamdown questiondown AE ae "
        "OE oe Oslash oslash germandbls Lslash lslash dotlessi acute "
        "dieresis macron cedilla caron breve circumflex tilde ring "
        "hungarumlaut ogonek dotaccent"
    ).split()
))

# Symbol uses its own glyph names (Symbol.afm)
_SYMBOL = _parse("""
space 250 exclam 333 universal 713 numbersign 500 existential 549
percent 833 ampersand 778 suchthat 439 parenleft 333 parenright 333
asteriskmath 500 plus 549 comma 250 minus 549 period 250 slash 278
zero 500 one 500 two 500 three 500 four 500 five 500 six 500 seven 500
eight 500 nine 500 colon 278 semicolon 278 less 549 equal 549 greater 549
question 444 congruent 549
Alpha 722 Beta 667 Chi 722 Delta 612 Epsilon 611 Phi 763 Gamma 603
Eta 722 Iota 333 theta1 631 Kappa 722 Lambda 686 Mu 889 Nu 722
Omicron 722 Pi 768 Theta 741 Rho 556 Sigma 592 Tau 611 Upsilon 690
sigma1 439 Omega 768 Xi 645 Psi 795 Zeta 611
bracketleft 333 therefore 863 bracketright 333 perpendicular 658
underscore 500 radicalex 500
alpha 631 beta 549 chi 549 delta 494 epsilon 439 phi 521 gamma 411
eta 603 iota 329 phi1 603 kappa 549 lambda 549 mu 576 nu 521 omicron 549
pi 549 theta 521 rho 549 sigma 603 tau 439 upsilon 576 omega1 713
omega 686 xi 493 psi 686 zeta 494
braceleft 480 bar 200 braceright 480 similar 549
""")

_ZAPF = _parse("space 278")

CORE14_WIDTHS: dict[str, dict[str, int]] = {
    "Helvetica": _font(_HELVETICA_ASCII, _HELVETICA_EXTRAS),
    "Helvetica-Oblique": _font(_HELVETICA_ASCII, _HELVETICA_EXTRAS),
    "Helvetica-Bold": _font(_HELVETICA_BOLD_ASCII, _HELVETICA_BOLD_EXTRAS),
    "Helvetica-BoldOblique": _font(_HELVETICA_BOLD_ASCII, _HELVETICA_BOLD_EXTRAS),
    "Times-Roman": _font(_TIMES_ASCII, _TIMES_EXTRAS),
    "Times-Bold": _font(_TIMES_BOLD_ASCII, _TIMES_BOLD_EXTRAS),
    "Times-Italic": _font(_TIMES_ITALIC_ASCII, _TIMES_ITALIC_EXTRAS),
    "Times-BoldItalic": _font(_TIMES_BOLDITALIC_ASCII, _TIMES_BOLDITALIC_EXTRAS),
    "Courier": _COURIER,
    "Courier-Bold": _COURIER,
    "Courier-Oblique": _COURIER,
    "Courier-BoldOblique": _COURIER,
    "Symbol": _SYMBOL,
    "ZapfDingbats": _ZAPF,
}

AFM_DEFAULT_WIDTH = 1000  # reference font/index.ts:407
