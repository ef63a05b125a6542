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
- Symbol ships its full charset (Greek/operators plus the arrows, card
  suits, bracket/paren/integral pieces, florin, aleph/fraktur block);
- ZapfDingbats ships the full a1..a206 dingbat metrics in AFM
  char-metric order (the table below transcribes the public Adobe
  ZapfDingbats.afm data, C 32..254 rows first, unencoded C -1 rows
  last — order matters, see next paragraph).

The reference keys its AFM width map by the AGL-decoded string
(font/index.ts:402-408 ``widthMapping[glyphlist[cm.name]] = cm.width``).
A name the AGL cannot decode yields JS ``undefined``, which property
access folds into ONE shared key that each such name overwrites — so in
the reference every non-AGL name collapses to a single catch-all width,
last writer (in AFM file order) winning, and that catch-all is what an
encoding-less char code measures at. fonts.py mirrors this with the
``None`` key: the AFM tables here must therefore iterate in AFM file
order. Glyphs outside these tables measure at the 1000 default width,
matching the reference's behavior for names its AGL lookup misses.
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
Upsilon1 620 minute 247 lessequal 549 fraction 167 infinity 713
florin 500 club 753 diamond 753 heart 753 spade 753 arrowboth 1042
arrowleft 987 arrowup 603 arrowright 987 arrowdown 603 degree 400
plusminus 549 second 411 greaterequal 549 multiply 549 proportional 713
partialdiff 494 bullet 460 divide 549 notequal 549 equivalence 549
approxequal 549 ellipsis 1000 arrowvertex 603 arrowhorizex 1000
carriagereturn 658 aleph 823 Ifraktur 686 Rfraktur 795 weierstrass 987
circlemultiply 768 circleplus 768 emptyset 823 intersection 768
union 768 propersuperset 713 reflexsuperset 713 notsubset 713
propersubset 713 reflexsubset 713 element 713 notelement 713 angle 768
gradient 713 registerserif 790 copyrightserif 790 trademarkserif 890
product 823 radical 549 dotmath 250 logicalnot 713 logicaland 603
logicalor 603 arrowdblboth 1042 arrowdblleft 987 arrowdblup 603
arrowdblright 987 arrowdbldown 603 lozenge 494 angleleft 329
registersans 790 copyrightsans 790 trademarksans 786 summation 713
parenlefttp 384 parenleftex 384 parenleftbt 384 bracketlefttp 384
bracketleftex 384 bracketleftbt 384 bracelefttp 494 braceleftmid 494
braceleftbt 494 braceex 494 angleright 329 integral 274 integraltp 686
integralex 686 integralbt 686 parenrighttp 384 parenrightex 384
parenrightbt 384 bracketrighttp 384 bracketrightex 384
bracketrightbt 384 bracerighttp 494 bracerightmid 494 bracerightbt 494
apple 790 Euro 750
""")

# ZapfDingbats.afm char metrics in FILE ORDER (C 32..126, C 161..254,
# then the unencoded C -1 rows) — insertion order drives the non-AGL
# catch-all (None key) last-writer semantics described in the module
# docstring. Public Adobe data.
_ZAPF = _parse("""
space 278
a1 974 a2 961 a202 974 a3 980 a4 719 a5 789 a119 790 a118 791 a117 690
a11 960 a12 939 a13 549 a14 855 a15 911 a16 933 a105 911 a17 945
a18 974 a19 755 a20 846 a21 762 a22 761 a23 571 a24 677 a25 763
a26 760 a27 759 a28 754 a6 494 a7 552 a8 537 a9 577 a10 692 a29 786
a30 788 a31 788 a32 790 a33 793 a34 794 a35 816 a36 823 a37 789
a38 841 a39 823 a40 833 a41 816 a42 831 a43 923 a44 744 a45 723
a46 749 a47 790 a48 792 a49 695 a50 776 a51 768 a52 792 a53 759
a54 707 a55 708 a56 682 a57 701 a58 826 a59 815 a60 789 a61 789
a62 707 a63 687 a64 696 a65 689 a66 786 a67 787 a68 713 a69 791
a70 785 a71 791 a72 873 a73 761 a74 762 a203 762 a75 759 a204 759
a76 892 a77 892 a78 788 a79 784 a81 438 a82 138 a83 277 a84 415
a97 392 a98 392 a99 668 a100 668
a101 732 a102 544 a103 544 a104 910 a106 667 a107 760 a108 760
a112 776 a111 595 a110 694 a109 626
a120 788 a121 788 a122 788 a123 788 a124 788 a125 788 a126 788
a127 788 a128 788 a129 788 a130 788 a131 788 a132 788 a133 788
a134 788 a135 788 a136 788 a137 788 a138 788 a139 788 a140 788
a141 788 a142 788 a143 788 a144 788 a145 788 a146 788 a147 788
a148 788 a149 788 a150 788 a151 788 a152 788 a153 788 a154 788
a155 788 a156 788 a157 788 a158 788 a159 788
a160 894 a161 838 a163 1016 a164 458 a196 748 a165 924 a192 748
a166 918 a167 927 a168 928 a169 928 a170 834 a171 873 a172 828
a173 924 a162 924 a174 917 a175 930 a176 931 a177 463 a178 883
a179 836 a193 836 a180 867 a199 867 a181 696 a200 696 a182 874
a201 874 a183 760 a184 946 a197 771 a185 865 a194 771 a198 888
a186 967 a195 888 a187 831 a188 873 a189 927 a190 970 a191 918
a89 390 a90 390 a93 317 a94 317 a91 276 a92 276 a205 509 a85 509
a206 410 a86 410 a87 234 a88 234 a95 334 a96 334
""")

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
