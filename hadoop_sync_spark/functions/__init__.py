"""Reusable column-level function library (text, vectors, hashing).

Everything returns :class:`pyspark.sql.Column` expressions built from
JVM-side builtins wherever possible, so composed pipelines stay inside
whole-stage codegen.
"""
