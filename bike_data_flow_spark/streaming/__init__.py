"""Structured Streaming surface: the Dagster sensor loop (ST1-ST7)
re-expressed as a file-source stream + foreachBatch day rebuild, and
the driver-side ingestion poller with the SHA-256 duplicate gate."""
