from .camera import Camera  # noqa: F401
from .params import (  # noqa: F401
    DenoiseParams,
    RenderParams,
    TemporalParams,
)
