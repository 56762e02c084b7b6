"""Cross-cutting utilities: metrics/roofline reporting and tracing."""
