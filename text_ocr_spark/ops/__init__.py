"""Training-data pipeline operators beyond the reference's own surface:
deduplication, similarity search, text analysis, multimodal plumbing.

All hot paths stay JVM-side (built-in pyspark.sql.functions, whole-stage
codegen); Python appears only in signature computation (numpy over Arrow
batches) where Spark lacks the primitive.
"""
