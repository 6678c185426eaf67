"""Deterministic local parsers replacing the reference's remote-LLM map.

The reference's single hot-path operator is one remote OpenAI call per
document (reference src/extractor.py:89, src/pdf_uploader.py:61). Here that
becomes two pure Python functions — ``extract_html_one`` and
``extract_pdf_one`` — wrapped in vectorized pandas UDFs (``udfs.py``).
No per-row Python ever runs on the Spark side of the Arrow boundary.
"""

from pdf_extractor_spark.extract.html_parser import extract_html_one
from pdf_extractor_spark.extract.pdf_parser import extract_pdf_one
from pdf_extractor_spark.extract.udfs import EXTRACT_RESULT_SCHEMA, extract_udf

__all__ = [
    "extract_html_one",
    "extract_pdf_one",
    "extract_udf",
    "EXTRACT_RESULT_SCHEMA",
]
