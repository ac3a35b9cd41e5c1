from verticut_tpu.search.linear import linear_search  # noqa: F401
from verticut_tpu.search.single import mih_search, SearchResult  # noqa: F401
