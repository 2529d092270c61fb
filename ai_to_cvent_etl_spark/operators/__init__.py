"""Reusable engine operators that go beyond single DataFrame calls:
as-of joins, dedup families, similarity search, text analysis, multimodal."""
