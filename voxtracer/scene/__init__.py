from .voxels import VoxelList, pack_leaves, voxels_from_vox  # noqa: F401
from .grid import GridScene, CELL_SIZE  # noqa: F401
from .octree import build_octree, octree_depth, resolve_octree  # noqa: F401
from .procedural import default_scene  # noqa: F401
