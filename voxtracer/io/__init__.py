from . import vox  # noqa: F401
