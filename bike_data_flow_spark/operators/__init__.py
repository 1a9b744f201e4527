"""Engine operators.

- parse/enhance/quality/views/analytics: reference-parity pipeline ops
  (SURVEY.md §2) re-expressed Spark-first.
- text/dedup/similarity/multimodal: large-scale training-data-pipeline
  operators (north star), designed for 100 TB (no driver loops, no
  row-at-a-time UDFs, hash-partitioned shuffles only where semantics
  require them).
"""
