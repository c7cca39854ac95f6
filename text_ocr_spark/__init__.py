"""text_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the *text-recovery behavior* of the
reference OCR pipeline (onexuan/Text-OCR, see /root/reference) as a batched,
Arrow-vectorized extraction job over tables of multi-turn agent transcripts:

- detect text regions  -> block/token density scoring (PSENet analog,
  ``kernels/blocks.py``, ref ocrlib/src/main/cpp/jni/ocr.cpp:253-339)
- filter noise         -> min-size + mean-score region filters
  (ref ocrlib/src/main/cpp/jni/ocr.cpp:191)
- expand/merge regions -> progressive threshold relaxation, first-claim-wins
  (ref ocrlib/src/main/cpp/jni/ocr.cpp:302-328)
- extract spans        -> raw-payload char offsets per kept region
- classify kind        -> {html, pdf, ocr, plain, empty} payload router
  (angle-classifier analog, ref ocrcvlib/src/main/cpp/jni/ocr.cpp:428-452)
- decode/normalize     -> explicit table-driven char mapping + CTC-style
  collapse (ref ocrlib/src/main/cpp/jni/ocr.cpp:96-117)

Architecture: pure numpy/pandas kernels (no Spark imports) orchestrated by
DataFrame ops + ``mapInPandas``; no RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
