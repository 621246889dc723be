"""Pure numpy/pandas kernels — no Spark imports allowed in this package.

Each module reproduces, from scratch, the *semantics* of a reference
subsystem (cited per-function with /root/reference file:line); the
implementations are new and vectorized for Arrow-batch execution inside
``mapInPandas`` / ``applyInPandas``.
"""

from . import boxes, combine, ctc, east_decode, html_extract, nms, pdf_layout, sort, textproc
