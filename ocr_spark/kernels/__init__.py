"""Pure numpy/pandas kernels — no Spark imports allowed in this package.

Each module reproduces, from scratch, the *semantics* of a reference
subsystem (cited per-function with /root/reference file:line); the
implementations are new and vectorized for Arrow-batch execution inside
``mapInPandas`` / ``applyInPandas``.
"""

from . import boxes, combine, nms, sort, ctc, html_extract, pdf_layout, textproc
