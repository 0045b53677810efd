"""Custom operators Spark lacks natively: dedup families, similarity search,
sessionization — each built as compositions of DataFrame ops (no RDDs, no
row-at-a-time Python)."""
