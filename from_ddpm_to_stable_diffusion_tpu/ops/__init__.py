"""Pure functional primitives: schedules, embeddings, attention, norms."""

from . import schedules
from . import embeddings
from . import image
from .attention import dot_product_attention, multi_head_attention
from .groupnorm import group_norm
