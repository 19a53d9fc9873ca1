"""Source/sink implementations (batch parquet log + streaming)."""
