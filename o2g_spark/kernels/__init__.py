"""Pure-numpy computational kernels (no Spark imports).

These are the vectorized array-in/array-out functions that the Arrow
pandas UDFs in :mod:`o2g_spark.functions` wrap. Keeping them Spark-free
makes them unit-testable without a JVM and reusable driver-side (e.g.
polygon cover precomputation before broadcast).
"""
