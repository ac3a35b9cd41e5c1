from verticut_tpu.models.lsh import ITQEncoder, RandomProjectionLSH  # noqa: F401
