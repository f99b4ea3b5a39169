from .renderer import render_sample, trace_rays  # noqa: F401
