"""Pure-Python per-document PDF extraction library (no Spark imports).

Semantics match chbrown/pdfi (see /root/reference); each module's
docstring cites the reference file(s) it re-expresses.
"""
