"""Serialization format mappings (reference flink-formats/*)."""
