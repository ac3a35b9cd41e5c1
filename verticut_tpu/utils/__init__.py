from verticut_tpu.utils.timer import Timer, scoped, show_all_timings, timings  # noqa: F401
from verticut_tpu.utils.logging import get_logger  # noqa: F401
