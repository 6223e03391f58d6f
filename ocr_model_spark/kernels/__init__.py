"""Pure-Python extraction kernels.

Every function in this package is a deterministic pure function
``bytes -> result`` with no Spark dependency. Byte-identity of the engine's
output is a property of these kernels; the Spark layer only vectorizes them
(pandas/Arrow UDFs). Tests exercise the kernels standalone AND through Spark
and assert the outputs are byte-identical.
"""

from ocr_model_spark.kernels.encoding import decode_with_fallback
from ocr_model_spark.kernels.html_extract import extract_html
from ocr_model_spark.kernels.sniff import sniff_doc_type

__all__ = ["decode_with_fallback", "extract_html", "sniff_doc_type"]
