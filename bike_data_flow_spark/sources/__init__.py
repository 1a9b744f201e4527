"""Secondary sources/sinks (SURVEY §2.1)."""
