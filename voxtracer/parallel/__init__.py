from .mesh import make_mesh, sharded_render_frame  # noqa: F401
