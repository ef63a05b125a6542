"""Whole-PDF fixtures NOT produced by core/pdfgen.py.

Hand-assembled byte layouts (explicit object placement, hand-chosen xref
subsections, literal offsets) frozen as byte literals, so a shared
generator/parser misunderstanding of the PDF spec cannot hide here.
Covers: a multi-trailer incremental-update /Prev chain (newer object
wins), a mismatched-byteLength CMap (first mapping byteLength wins with
a warning, reference parsers/states.ts:784-792), an indirect /Length
stream with comment lines, and a multi-subsection classic xref table
(PDF32000 7.5.4 layout, reference test/xref.ts:16-163 territory), and a
PDF-1.5 unfiltered cross-reference STREAM (W [1 2 1], all objects
top-level).
"""

INCREMENTAL_PDF = b'%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length 52 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (original text) Tj ET\nendstream\nendobj\n5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\nxref\n0 6\n0000000000 65535 f \n0000000009 00000 n \n0000000058 00000 n \n0000000117 00000 n \n0000000245 00000 n \n0000000347 00000 n \ntrailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n837\n%%EOF\n4 0 obj\n<< /Length 56 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (updated text wins) Tj ET\nendstream\nendobj\nxref\n0 1\n0000000000 65535 f \n4 1\n0000001020 00000 n \ntrailer\n<< /Size 6 /Root 1 0 R /Prev 837 >>\nstartxref\n1126\n%%EOF\n'

INCREMENTAL_EXPECTED = '# \nupdated text wins'

MIXEDLEN_PDF = b'%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n4 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /MixedCID /Encoding /Identity-H /DescendantFonts [ 6 0 R ] /ToUnicode 7 0 R >>\nendobj\n5 0 obj\n<< /Length 59 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm <00010002000300100011> Tj ET\nendstream\nendobj\n6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /MixedCID /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> /DW 500 >>\nendobj\n7 0 obj\n<< /Length 311 >>\nstream\n/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n2 begincodespacerange\n<00> <80>\n<0000> <FFFF>\nendcodespacerange\n4 beginbfchar\n<0001> <006d>\n<0002> <0069>\n<0003> <0078>\n<41> <005a>\nendbfchar\n1 beginbfrange\n<0010> <0011> <0065>\nendbfrange\nendcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\nendstream\nendobj\nxref\n0 8\n0000000000 65535 f \n0000000009 00000 n \n0000000058 00000 n \n0000000117 00000 n \n0000000245 00000 n \n0000000380 00000 n \n0000000489 00000 n \n0000000647 00000 n \ntrailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n1009\n%%EOF\n'

MIXEDLEN_EXPECTED = '# \nmixef'

INDIRECT_LENGTH_PDF = b'%PDF-1.3\n% comment line\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 6 0 R >> >> /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length 5 0 R >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (indirect length works) Tj ET\nendstream\nendobj\n5 0 obj\n60\nendobj\n6 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\nxref\n0 7\n0000000000 65535 f \n0000000024 00000 n \n0000000073 00000 n \n0000000132 00000 n \n0000000260 00000 n \n0000000373 00000 n \n0000000391 00000 n \ntrailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n881\n%%EOF\n'

INDIRECT_LENGTH_EXPECTED = '# \nindirect length works'

MULTISUBSECTION_PDF = b'%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 7 0 R >> >> /Contents 6 0 R >>\nendobj\n6 0 obj\n<< /Length 56 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (subsections parse) Tj ET\nendstream\nendobj\n7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\nxref\n0 1\n0000000000 65535 f \n1 3\n0000000009 00000 n \n0000000058 00000 n \n0000000117 00000 n \n6 2\n0000000245 00000 n \n0000000351 00000 n \ntrailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n841\n%%EOF\n'

MULTISUBSECTION_EXPECTED = '# \nsubsections parse'

XREFSTREAM_PDF = b'%PDF-1.5\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length 58 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (xref stream by hand) Tj ET\nendstream\nendobj\n5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\n6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 2 1 ] /Root 1 0 R /Length 28 >>\nstream\n\x00\x00\x00\xff\x01\x00\t\x00\x01\x00:\x00\x01\x00u\x00\x01\x00\xf5\x00\x01\x01a\x00\x01\x03K\x00\nendstream\nendobj\nstartxref\n843\n%%EOF\n'

XREFSTREAM_EXPECTED = '# \nxref stream by hand'

# Annex-F linearized layout: linearization parameter dict first, the
# FIRST-PAGE xref table near the top (trailer /Prev -> the main xref at
# the end of file, then the dummy "startxref 0" + %%EOF the spec puts
# after part 3), first-page objects, main part, main xref, and the real
# startxref at EOF pointing BACK to the front table — exercises
# lastIndexOf('startxref') picking the final marker past a mid-file one,
# and a /Prev chain that jumps backward in byte order.
LINEARIZED_PDF = b'%PDF-1.4\n7 0 obj\n<< /Linearized 1 /L 9999 /H [ 0 0 ] /O 8 /E 404 /N 1 /T 1066 >>\nendobj\nxref\n7 2\n0000000009 00000 n \n0000000226 00000 n \n10 1\n0000000275 00000 n \ntrailer\n<< /Size 11 /Root 8 0 R /Prev 1066 >>\nstartxref\n0\n%%EOF\n8 0 obj\n<< /Type /Catalog /Pages 1 0 R >>\nendobj\n10 0 obj\n<< /Type /Page /Parent 1 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 3 0 R >> >> /Contents 2 0 R >>\nendobj\n1 0 obj\n<< /Type /Pages /Kids [ 10 0 R ] /Count 1 >>\nendobj\n2 0 obj\n<< /Length 62 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (linearized front matter) Tj ET\nendstream\nendobj\n3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\nxref\n0 4\n0000000000 65535 f \n0000000404 00000 n \n0000000464 00000 n \n0000000576 00000 n \ntrailer\n<< /Size 11 /Root 8 0 R >>\nstartxref\n88\n%%EOF\n'

LINEARIZED_EXPECTED = '# \nlinearized front matter'

# Hybrid-reference file (PDF32000 7.5.8.4): classic xref whose trailer
# carries /XRefStm pointing at a cross-reference STREAM whose object-4
# row resolves to the OLD contents ("hybrid stream honored"). The
# reference follows only /Prev and ignores the hint
# (/root/reference/PDF.ts:31-50), so the classic table's object 4 must
# win — this fixture pins that divergence-by-design on a real-world
# incremental-update shape. Both content objects are present in the
# bytes; test_handmade asserts the XRefStm text does NOT surface.
HYBRID_XREFSTM_PDF = b'%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length 60 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (hybrid stream honored) Tj ET\nendstream\nendobj\n5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\n4 0 obj\n<< /Length 57 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (classic table wins) Tj ET\nendstream\nendobj\n6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 2 1 ] /Root 1 0 R /Length 28 >>\nstream\n\x00\x00\x00\xff\x01\x00\t\x00\x01\x00:\x00\x01\x00u\x00\x01\x00\xf5\x00\x01\x01c\x00\x01\x03\xb8\x00\nendstream\nendobj\nxref\n0 7\n0000000000 65535 f \n0000000009 00000 n \n0000000058 00000 n \n0000000117 00000 n \n0000000845 00000 n \n0000000355 00000 n \n0000000952 00000 n \ntrailer\n<< /Size 7 /Root 1 0 R /XRefStm 952 >>\nstartxref\n1075\n%%EOF\n'

HYBRID_XREFSTM_EXPECTED = '# \nclassic table wins'


# Incremental update where BOTH cross-reference sections are STREAMS
# chained via /Prev (the shape every modern writer produces on re-save):
# base xref stream (obj 6, Size 7) <- /Prev <- update xref stream (obj 7,
# Size 8, sparse /Index [4 1 7 1]) redefining object 4. Pins: /Index
# subsection decoding, the Prev chain across stream trailers, newer
# OBJECT winning, and the reference's oldest-wins TRAILER merge
# (models.ts:454-457 assign([newest..oldest]) lets the LAST/oldest dict
# override, its comment notwithstanding) => merged Size stays 7.
INCXSTREAM_PDF = b'%PDF-1.5\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n4 0 obj\n<< /Length 59 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (original stream body) Tj ET\nendstream\nendobj\n5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /FirstChar 32 /LastChar 126 /Widths [ 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 500 ] >>\nendobj\n6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 2 1 ] /Root 1 0 R /Length 28 >>\nstream\n\x00\x00\x00\xff\x01\x00\t\x00\x01\x00:\x00\x01\x00u\x00\x01\x00\xf5\x00\x01\x01b\x00\x01\x03L\x00\nendstream\nendobj\nstartxref\n844\n%%EOF\n4 0 obj\n<< /Length 61 >>\nstream\nBT /F1 10 Tf 1 0 0 1 72 720 Tm (xref stream chain wins) Tj ET\nendstream\nendobj\n7 0 obj\n<< /Type /XRef /Size 8 /Index [ 4 1 7 1 ] /W [ 1 2 1 ] /Root 1 0 R /Prev 844 /Length 8 >>\nstream\n\x01\x03\xdb\x00\x01\x04J\x00\nendstream\nendobj\nstartxref\n1098\n%%EOF\n'

INCXSTREAM_EXPECTED = '# \nxref stream chain wins'


HANDMADE = {
    "incremental": (INCREMENTAL_PDF, INCREMENTAL_EXPECTED),
    "mixedlen": (MIXEDLEN_PDF, MIXEDLEN_EXPECTED),
    "indirect_length": (INDIRECT_LENGTH_PDF, INDIRECT_LENGTH_EXPECTED),
    "multisubsection": (MULTISUBSECTION_PDF, MULTISUBSECTION_EXPECTED),
    "xrefstream": (XREFSTREAM_PDF, XREFSTREAM_EXPECTED),
    "linearized": (LINEARIZED_PDF, LINEARIZED_EXPECTED),
    "hybrid_xrefstm": (HYBRID_XREFSTM_PDF, HYBRID_XREFSTM_EXPECTED),
    "inc_xrefstream": (INCXSTREAM_PDF, INCXSTREAM_EXPECTED),
}
