"""hadoop_data_lake_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference data-lake pipeline (avshapoval/hadoop_data_lake),
plus large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal columns).

Design principles (see SURVEY.md):
- DataFrame/SQL first: every operator builds a Catalyst logical plan
  declaratively; no RDDs, no driver-side loops over collected data.
- Broadcast small dimensions explicitly; banded/grid equi-join prefilters for
  range and distance predicates so nothing is O(N^2) at 100 TB.
- Python UDFs only where built-ins genuinely cannot express the semantics, and
  then always Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
- Deterministic results: explicit tie-breaks in every window, fixed pivot value
  lists, fixed-point (integer) summation for money-like doubles so results are
  reproducible across engines and partitionings.
"""

__version__ = "0.1.0"

from hadoop_data_lake_spark.core.session import get_spark  # noqa: F401
