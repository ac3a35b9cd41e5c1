from verticut_tpu.service.server import ImageSearchServer  # noqa: F401
from verticut_tpu.service.client import ImageSearchClient, ReplicatedSearchClient  # noqa: F401
