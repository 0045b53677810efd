"""Structured Streaming surface: watermarked event rollups and stateful
sessionization (batch twins live in plans/extensions.py)."""
