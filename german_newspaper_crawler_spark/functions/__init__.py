"""Column-expression helpers (JVM-side) and vectorized Arrow UDFs.

Everything here is either a pure ``pyspark.sql.functions`` composition
(whole-stage-codegen friendly) or an Arrow-batched pandas UDF — never
row-at-a-time Python (north-rule hard requirement).
"""
