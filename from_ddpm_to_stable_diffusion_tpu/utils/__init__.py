"""Runtime services: configs, logging, profiling, checkpoints, RNG."""

from .rng import RngStream
from .dtypes import DTypePolicy, POLICIES
