from verticut_tpu.ops.pallas.linear_scan import pallas_pairwise_hamming  # noqa: F401
