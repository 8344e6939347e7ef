"""End-user pipelines: trainers and generation entry points."""
