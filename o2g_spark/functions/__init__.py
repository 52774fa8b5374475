"""Column functions + vectorized Arrow UDFs.

Layering rule (BASELINE.json: "never per-row Python"):

1. Pure ``pyspark.sql.functions`` Column expressions — JVM-side, inside
   whole-stage codegen (cell encode, tile math, distances). The default.
2. Arrow ``pandas_udf`` wrapping a numpy kernel — only where Catalyst
   has no primitive (regex extractall fan-out, ray-cast refine).
3. Row-at-a-time ``F.udf`` — forbidden in this codebase.
"""
