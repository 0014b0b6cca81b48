"""datavalidation_spark — a from-scratch PySpark-native schema + constraint
validation engine with the capabilities of ``tarunagarwal1981/datavalidation``
(reference read-only at /root/reference), re-expressed Spark-first.

The reference is a Streamlit/pandas app running ~35 per-row domain validation
rules over Postgres tables (see SURVEY.md). Here every rule is a declarative
:class:`datavalidation_spark.rules.core.Rule` compiled to vectorized Column
expressions / window specs / broadcast joins; statistical rules (KS drift,
anomaly ensemble, change-point, mutual information) run as Arrow-batched
grouped pandas UDFs. Primary target data model (BASELINE.json input_hint):
an Iceberg/parquet table of interleaved text+media documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
"""

__version__ = "0.1.0"
