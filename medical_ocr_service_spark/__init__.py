"""medical_ocr_service_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the query/data-processing capabilities of the reference service
(silviosotelo/medical-ocr-service, a Node.js + PostgreSQL/pgvector medical-order
extraction API) as a deterministic, vectorized, columnar Spark batch pipeline:

* interleaved text+media documents -> ordered span sequences (boilerplate strip,
  XY-cut layout reading-order) -> rule/state-machine field extraction ->
  similarity matching against procedure-code / provider dimensions ->
  pre-authorization (pre-visacion) result tables;
* plus the relational/reporting operators (conditional aggregation, windows,
  top-k, upserts) the reference runs in SQL, and the large-scale training-data
  operators (dedup, ANN similarity search, text quality analysis) a 100 TB
  corpus pipeline needs.

Everything is built on the public PySpark DataFrame API; custom logic runs in
Arrow-batched pandas UDFs (never row-at-a-time Python UDFs).
"""

__version__ = "0.1.0"
