"""Configuration, data model, and sample IO utilities."""
