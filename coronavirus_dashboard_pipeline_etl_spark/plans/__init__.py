"""Composed pipelines and the driver-gate query registry."""
