"""Flax model zoo (NHWC, dtype-polymorphic, TPU-first)."""
