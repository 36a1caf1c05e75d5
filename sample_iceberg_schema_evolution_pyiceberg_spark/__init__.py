"""PySpark-native analytics engine with the capabilities of
``aws-samples/sample-iceberg-schema-evolution-pyiceberg``.

The reference is an Iceberg schema-evolution control plane (JSON table
definition -> schema compile -> diff -> evolution transaction -> append).
This package rebuilds that capability Spark-first:

- ``config`` / ``schema_compiler``: JSON table-definition -> pyspark
  ``StructType`` with Iceberg-style field IDs (reference:
  ``lambda/constants.py``, ``lambda/iceberg_helper.py:127-178``).
- ``table_format``: a lightweight lakehouse table layer (versioned
  field-ID schemas, hidden-partitioning transforms, snapshot log) over
  Spark-written parquet, standing in for an Iceberg catalog (no Iceberg
  runtime jar is available in this environment).
- ``schema_diff`` / ``evolution``: per-column-path diff into
  ``SchemaChange`` records and the ordered evolution plan
  (drop -> add root -> add nested -> update -> reorder), mirroring
  ``lambda/iceberg_helper.py:247-363`` semantics.
- ``partitioning``: identity/year/month/day/hour transforms and
  partition-spec evolution (``lambda/iceberg_helper.py:364-425``).
- ``operators``/``functions``/``sources``/``streaming``: the declared
  relational query surface (SURVEY.md Tier B) plus LLM-data-pipeline
  extensions (dedup, similarity search, text analysis, multimodal
  columns — Tier C), all idiomatic DataFrame/SQL.
"""

from __future__ import annotations

__version__ = "0.1.0"
