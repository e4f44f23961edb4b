"""pyveb_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL library (Vlaams-Energiebedrijf/pyveb, studied read-only at
/root/reference — see SURVEY.md for the full operator inventory and
citations): multi-format sources, a typed schema-enforcement and cleaning
library, nested-data operators, the full relational surface, partitioned
idempotent writes with append/overwrite/upsert merges, Structured Streaming,
and LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) — every operator designed partition-wise for 100 TB.
"""

from pyveb_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
