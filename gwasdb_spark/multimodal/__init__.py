"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/feature plumbing (decoders stubbed — no media libraries
in this container; the Spark-side schema, partitioning and batch shapes are
real and tested)."""
