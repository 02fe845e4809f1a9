"""Column-level function library: geo kernels, text analysis, similarity.

Everything row-level here is either a built-in ``pyspark.sql.functions``
expression (JVM side, whole-stage codegen) or an Arrow-batched pandas UDF
wrapping the NumPy kernels in :mod:`geolake_spark.cells` — never per-row
Python (BASELINE.json ``input_hint``).
"""
