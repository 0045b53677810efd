"""Source/sink connectors: typed CSV/TSV readers with the reference's
cleaning conventions, parquet writers with scale-aware layout."""
