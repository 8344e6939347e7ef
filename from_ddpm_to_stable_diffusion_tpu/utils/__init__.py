"""Runtime services: configs, logging, profiling, checkpoints."""

from .dtypes import DTypePolicy, POLICIES
