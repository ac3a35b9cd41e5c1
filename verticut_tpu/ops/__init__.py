from verticut_tpu.ops import enumeration, hamming, topk  # noqa: F401
