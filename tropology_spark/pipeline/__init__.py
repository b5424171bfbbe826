"""End-to-end pipelines composing the operator layers."""
