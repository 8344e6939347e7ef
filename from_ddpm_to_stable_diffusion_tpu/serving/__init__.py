"""TPU-native serving: dynamic batching + HTTP front-end.

The server side of the reference's stage-09 capability (it only ships the
Replicate *client*, 09_api/01_replicate.py): compiled-once generators
(SD1Generator et al.) behind a bucketed dynamic batcher and a stdlib HTTP
endpoint. See docs/SERVING.md.
"""

from .batcher import DynamicBatcher, Future, GenerateRequest
from .server import make_server, serve_forever_in_thread

__all__ = ["DynamicBatcher", "Future", "GenerateRequest", "make_server",
           "serve_forever_in_thread"]
