from .timing import FpsCounter, StageTimer, Stopwatch  # noqa: F401
from .log import setup_logging  # noqa: F401
