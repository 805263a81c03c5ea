"""Pure-Python per-document kernel.

These modules have **no Spark dependency**: they are the single source of
truth for the reference semantics, used both by the pytest oracle and by the
Arrow UDF stages in ``servico_ocr_spark.pipeline``.
"""
