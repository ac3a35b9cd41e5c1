from verticut_tpu.search.linear import linear_search  # noqa: F401
from verticut_tpu.search.single import (  # noqa: F401
    SearchResult, mih_search, mih_search_dispatch, mih_search_finalize)
