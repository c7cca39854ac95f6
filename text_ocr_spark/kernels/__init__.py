"""Pure numpy/pandas kernels — importable without a SparkSession.

Every function here is deterministic and side-effect free; the Spark layer
(``text_ocr_spark.pipeline``) only moves Arrow batches through these.
"""

from text_ocr_spark.kernels.extract import extract_payload  # noqa: F401
from text_ocr_spark.kernels.classify import classify_payload  # noqa: F401
from text_ocr_spark.kernels.normalize import normalize_text  # noqa: F401
