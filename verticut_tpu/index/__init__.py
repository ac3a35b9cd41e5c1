from verticut_tpu.index.directory import DenseDirectory, SortedDirectory  # noqa: F401
from verticut_tpu.index.mih import MIHIndex, MIHTable, build_index  # noqa: F401
from verticut_tpu.index.bitmap import Bitmap  # noqa: F401
