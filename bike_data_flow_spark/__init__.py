"""bike_data_flow_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference pipeline (seszele64/bike-data-flow): batch + streaming
ingestion of bike-share station snapshots, typed parsing/validation,
enrichment, catalog views, spatial density analytics — re-expressed as
idiomatic Spark DataFrame / SQL / Structured Streaming plans, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference never had.

Design rules (100 TB first):
- declarative DataFrame plans; let Catalyst do pushdown/pruning/reorder
- broadcast small dims, bin-arithmetic instead of theta joins
- no driver-side loops over data; no row-at-a-time Python UDFs in hot paths
"""

__version__ = "0.1.0"
