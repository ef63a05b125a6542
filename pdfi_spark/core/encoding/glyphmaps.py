"""Base encodings: character code -> glyph name.

Sources: PDF 32000-1:2008 Annex D (public spec), matching the role of the
reference's encoding/glyphmaps.ts. Stored as dicts {code: glyphname};
missing codes are unmapped (the reference uses sparse arrays).

DOCUMENTED spec-over-reference exception: these tables are Annex-D
COMPLETE, while the reference's glyphmaps.ts leaves holes —
MacRomanEncoding there omits 16 symbol codes (173 notequal, 176
infinity, 178/179 lessequal/greaterequal, 182-186 partialdiff..integral,
189 Omega, 195 radical, 197 approxequal, 198 Delta, 202 space (nbsp),
215 lozenge, 240 apple) and WinAnsiEncoding omits 173 hyphen (soft
hyphen). For those codes the reference decodes nothing (skip) where we
decode the Annex-D glyph; the generator recipes (e.g. recipe_macroman's
code 202) and their oracles depend on the complete tables.
"""

_ASCII_NAMES = {
    32: "space", 33: "exclam", 34: "quotedbl", 35: "numbersign",
    36: "dollar", 37: "percent", 38: "ampersand",
    40: "parenleft", 41: "parenright", 42: "asterisk", 43: "plus",
    44: "comma", 45: "hyphen", 46: "period", 47: "slash",
    48: "zero", 49: "one", 50: "two", 51: "three", 52: "four",
    53: "five", 54: "six", 55: "seven", 56: "eight", 57: "nine",
    58: "colon", 59: "semicolon", 60: "less", 61: "equal",
    62: "greater", 63: "question", 64: "at",
    91: "bracketleft", 92: "backslash", 93: "bracketright",
    94: "asciicircum", 95: "underscore",
    123: "braceleft", 124: "bar", 125: "braceright", 126: "asciitilde",
}
_ASCII_NAMES.update({c: chr(c) for c in range(65, 91)})   # A-Z
_ASCII_NAMES.update({c: chr(c) for c in range(97, 123)})  # a-z

# StandardEncoding (Annex D.2, STD column): 39 -> quoteright, 96 -> quoteleft
StandardEncoding: dict[int, str] = dict(_ASCII_NAMES)
StandardEncoding.update({
    39: "quoteright", 96: "quoteleft",
    161: "exclamdown", 162: "cent", 163: "sterling", 164: "fraction",
    165: "yen", 166: "florin", 167: "section", 168: "currency",
    169: "quotesingle", 170: "quotedblleft", 171: "guillemotleft",
    172: "guilsinglleft", 173: "guilsinglright", 174: "fi", 175: "fl",
    177: "endash", 178: "dagger", 179: "daggerdbl", 180: "periodcentered",
    182: "paragraph", 183: "bullet", 184: "quotesinglbase",
    185: "quotedblbase", 186: "quotedblright", 187: "guillemotright",
    188: "ellipsis", 189: "perthousand", 191: "questiondown",
    193: "grave", 194: "acute", 195: "circumflex", 196: "tilde",
    197: "macron", 198: "breve", 199: "dotaccent", 200: "dieresis",
    202: "ring", 203: "cedilla", 205: "hungarumlaut", 206: "ogonek",
    207: "caron", 208: "emdash",
    225: "AE", 227: "ordfeminine", 232: "Lslash", 233: "Oslash",
    234: "OE", 235: "ordmasculine", 241: "ae", 245: "dotlessi",
    248: "lslash", 249: "oslash", 250: "oe", 251: "germandbls",
})

_LATIN1_UPPER = [
    "Agrave", "Aacute", "Acircumflex", "Atilde", "Adieresis", "Aring",
    "AE", "Ccedilla", "Egrave", "Eacute", "Ecircumflex", "Edieresis",
    "Igrave", "Iacute", "Icircumflex", "Idieresis", "Eth", "Ntilde",
    "Ograve", "Oacute", "Ocircumflex", "Otilde", "Odieresis", "multiply",
    "Oslash", "Ugrave", "Uacute", "Ucircumflex", "Udieresis", "Yacute",
    "Thorn", "germandbls",
]
_LATIN1_LOWER = [
    "agrave", "aacute", "acircumflex", "atilde", "adieresis", "aring",
    "ae", "ccedilla", "egrave", "eacute", "ecircumflex", "edieresis",
    "igrave", "iacute", "icircumflex", "idieresis", "eth", "ntilde",
    "ograve", "oacute", "ocircumflex", "otilde", "odieresis", "divide",
    "oslash", "ugrave", "uacute", "ucircumflex", "udieresis", "yacute",
    "thorn", "ydieresis",
]

# WinAnsiEncoding (Annex D.2, WIN column): 39 -> quotesingle, 96 -> grave
WinAnsiEncoding: dict[int, str] = dict(_ASCII_NAMES)
WinAnsiEncoding.update({39: "quotesingle", 96: "grave"})
WinAnsiEncoding.update({
    128: "Euro", 130: "quotesinglbase", 131: "florin", 132: "quotedblbase",
    133: "ellipsis", 134: "dagger", 135: "daggerdbl", 136: "circumflex",
    137: "perthousand", 138: "Scaron", 139: "guilsinglleft", 140: "OE",
    142: "Zcaron", 145: "quoteleft", 146: "quoteright", 147: "quotedblleft",
    148: "quotedblright", 149: "bullet", 150: "endash", 151: "emdash",
    152: "tilde", 153: "trademark", 154: "scaron", 155: "guilsinglright",
    156: "oe", 158: "zcaron", 159: "Ydieresis",
    161: "exclamdown", 162: "cent", 163: "sterling", 164: "currency",
    165: "yen", 166: "brokenbar", 167: "section", 168: "dieresis",
    169: "copyright", 170: "ordfeminine", 171: "guillemotleft",
    172: "logicalnot", 173: "hyphen", 174: "registered", 175: "macron",
    176: "degree", 177: "plusminus", 178: "twosuperior",
    179: "threesuperior", 180: "acute", 181: "mu", 182: "paragraph",
    183: "periodcentered", 184: "cedilla", 185: "onesuperior",
    186: "ordmasculine", 187: "guillemotright", 188: "onequarter",
    189: "onehalf", 190: "threequarters", 191: "questiondown",
})
WinAnsiEncoding.update({192 + i: n for i, n in enumerate(_LATIN1_UPPER)})
WinAnsiEncoding.update({224 + i: n for i, n in enumerate(_LATIN1_LOWER)})

# MacRomanEncoding (Annex D.2, MAC column)
MacRomanEncoding: dict[int, str] = dict(_ASCII_NAMES)
MacRomanEncoding.update({39: "quotesingle", 96: "grave"})
_MAC_HIGH = [
    "Adieresis", "Aring", "Ccedilla", "Eacute", "Ntilde", "Odieresis",
    "Udieresis", "aacute", "agrave", "acircumflex", "adieresis", "atilde",
    "aring", "ccedilla", "eacute", "egrave", "ecircumflex", "edieresis",
    "iacute", "igrave", "icircumflex", "idieresis", "ntilde", "oacute",
    "ograve", "ocircumflex", "odieresis", "otilde", "uacute", "ugrave",
    "ucircumflex", "udieresis", "dagger", "degree", "cent", "sterling",
    "section", "bullet", "paragraph", "germandbls", "registered",
    "copyright", "trademark", "acute", "dieresis", "notequal", "AE",
    "Oslash", "infinity", "plusminus", "lessequal", "greaterequal", "yen",
    "mu", "partialdiff", "summation", "product", "pi", "integral",
    "ordfeminine", "ordmasculine", "Omega", "ae", "oslash", "questiondown",
    "exclamdown", "logicalnot", "radical", "florin", "approxequal",
    "Delta", "guillemotleft", "guillemotright", "ellipsis", "space",
    "Agrave", "Atilde", "Otilde", "OE", "oe", "endash", "emdash",
    "quotedblleft", "quotedblright", "quoteleft", "quoteright", "divide",
    "lozenge", "ydieresis", "Ydieresis", "fraction", "currency",
    "guilsinglleft", "guilsinglright", "fi", "fl", "daggerdbl",
    "periodcentered", "quotesinglbase", "quotedblbase", "perthousand",
    "Acircumflex", "Ecircumflex", "Aacute", "Edieresis", "Egrave",
    "Iacute", "Icircumflex", "Idieresis", "Igrave", "Oacute",
    "Ocircumflex", "apple", "Ograve", "Uacute", "Ucircumflex", "Ugrave",
    "dotlessi", "circumflex", "tilde", "macron", "breve", "dotaccent",
    "ring", "cedilla", "hungarumlaut", "ogonek", "caron",
]
MacRomanEncoding.update({128 + i: n for i, n in enumerate(_MAC_HIGH)})

# PDFDocEncoding (Annex D.2, PDF column)
PDFDocEncoding: dict[int, str] = dict(_ASCII_NAMES)
PDFDocEncoding.update({39: "quotesingle", 96: "grave"})
PDFDocEncoding.update({
    24: "breve", 25: "caron", 26: "circumflex", 27: "dotaccent",
    28: "hungarumlaut", 29: "ogonek", 30: "ring", 31: "tilde",
    128: "bullet", 129: "dagger", 130: "daggerdbl", 131: "ellipsis",
    132: "emdash", 133: "endash", 134: "florin", 135: "fraction",
    136: "guilsinglleft", 137: "guilsinglright", 138: "minus",
    139: "perthousand", 140: "quotedblbase", 141: "quotedblleft",
    142: "quotedblright", 143: "quoteleft", 144: "quoteright",
    145: "quotesinglbase", 146: "trademark", 147: "fi", 148: "fl",
    149: "Lslash", 150: "OE", 151: "Scaron", 152: "Ydieresis",
    153: "Zcaron", 154: "dotlessi", 155: "lslash", 156: "oe",
    157: "scaron", 158: "zcaron", 160: "Euro",
    161: "exclamdown", 162: "cent", 163: "sterling", 164: "currency",
    165: "yen", 166: "brokenbar", 167: "section", 168: "dieresis",
    169: "copyright", 170: "ordfeminine", 171: "guillemotleft",
    172: "logicalnot", 174: "registered", 175: "macron",
    176: "degree", 177: "plusminus", 178: "twosuperior",
    179: "threesuperior", 180: "acute", 181: "mu", 182: "paragraph",
    183: "periodcentered", 184: "cedilla", 185: "onesuperior",
    186: "ordmasculine", 187: "guillemotright", 188: "onequarter",
    189: "onehalf", 190: "threequarters", 191: "questiondown",
})
PDFDocEncoding.update({192 + i: n for i, n in enumerate(_LATIN1_UPPER)})
PDFDocEncoding.update({224 + i: n for i, n in enumerate(_LATIN1_LOWER)})

GLYPHMAPS: dict[str, dict[int, str]] = {
    "StandardEncoding": StandardEncoding,
    "MacRomanEncoding": MacRomanEncoding,
    "WinAnsiEncoding": WinAnsiEncoding,
    "PDFDocEncoding": PDFDocEncoding,
}
