"""Beyond-reference analytics operators: dedup, similarity search,
text analysis, multimodal columns — designed for 100 TB scale."""
