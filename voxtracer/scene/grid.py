"""Dense voxel grid + occupancy mip pyramid — the TPU acceleration structure.

The reference traverses a pointer-chasing sparse octree on the GPU
(``shaders/voxels.comp:134-247``).  Pointer chasing is hostile to TPU
vector units, so the TPU-native equivalent is:

  * a dense int32 value grid over the scene's bounding box (0 = empty,
    negative = packed leaf value — same encoding, ``src/context.rs:734``),
  * a pyramid of boolean occupancy mips (level ``l`` cell = ``2**l`` base
    cells) enabling hierarchical DDA empty-space skipping with identical
    hit results to the octree traversal.

World mapping (must match the octree ABI): ``create_octree`` writes
``root_size = 2**depth`` and the traversal descends one level per
positive child until it finds a negative leaf (``voxels.comp:175-189``,
``src/context.rs:710-773``).  Working through both, an integer voxel at
position ``p`` occupies the world cube ``[p*0.5, p*0.5 + 0.5)`` — the
leaf cells of the octree sit one level *below* the integer lattice, so a
voxel is half a world unit across.  The grid stores that mapping as
``world = (index + origin) * CELL_SIZE``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

from .voxels import VoxelList, pack_leaves

CELL_SIZE = 0.5  # world size of one voxel

# Device palette capacity: leaf values are palettized so the TPU kernel
# can resolve hit colors with an in-VMEM (8, 128) table gather.  Scenes
# with more distinct leaf values (the random-colored procedural bowl)
# are quantized by hashing values into slots; colliding values share a
# color.  Quantization happens at build time, so the oracle, XLA and
# Pallas renderers all see the identical quantized scene.
PALETTE_CAPACITY = 1024


def _ceil_multiple(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class GridScene:
    """Device-friendly scene: dense values plus occupancy mips.

    Attributes:
      values: int32 [X, Y, Z]; 0 = empty, negative = packed leaf.
      origin: int32 [3] — voxel-lattice coordinate of grid index (0,0,0).
      shape:  padded grid dims (multiples of ``pad``).
      mips:   occupancy bools, mips[0] is full resolution, each following
              level halves every axis (shape padded up).
    """

    values: np.ndarray
    origin: np.ndarray
    mips: List[np.ndarray]

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.values.shape

    def world_min(self) -> np.ndarray:
        return self.origin.astype(np.float32) * CELL_SIZE

    def world_max(self) -> np.ndarray:
        return (self.origin + np.array(self.values.shape)).astype(
            np.float32
        ) * CELL_SIZE

    @staticmethod
    def from_voxels(
        voxels: VoxelList, pad: int = 8, num_mips: int = 6
    ) -> "GridScene":
        if len(voxels) == 0:
            values = np.zeros((pad, pad, pad), dtype=np.int32)
            origin = np.zeros(3, dtype=np.int32)
        else:
            pos = voxels.pos.astype(np.int64)
            lo = pos.min(axis=0)
            hi = pos.max(axis=0)
            dims = [
                _ceil_multiple(int(h - l) + 1, pad) for l, h in zip(lo, hi)
            ]
            leaves = _quantize_leaves(pack_leaves(voxels.mrgb))
            origin = lo.astype(np.int32)
            # Later duplicates win, like repeated octree insertion
            # overwriting the same leaf slot.  The native (C++) fill is
            # used when built; the numpy path is bit-identical.
            from .. import native

            values = native.fill_grid(voxels.pos, leaves, origin, dims)
            if values is None:
                values = np.zeros(dims, dtype=np.int32)
                idx = pos - lo
                values[idx[:, 0], idx[:, 1], idx[:, 2]] = leaves

        mips = _build_mips(values != 0, num_mips)
        return GridScene(values=values, origin=origin, mips=mips)

    def device_tables(self) -> Dict[str, np.ndarray]:
        """Build the Pallas-kernel tables.

        Returns:
          packed_idx: (rows, 128) int32 — the palette-index grid with 3
            consecutive-z 10-bit indices packed per word (0 = empty), flat
            word address ``(x * Y + y) * ceil(Z/3) + z // 3``, padded to a
            whole number of 128-word rows.
          palette: (8, 128) int32 — slot -> packed leaf value (slot 0 = 0).
          zw: number of packed words along z (= ceil(Z/3)).
        """
        from .. import native

        x_dim, y_dim, z_dim = self.values.shape
        zw = -(-z_dim // 3)

        packed = native.pack_words(self.values, PALETTE_CAPACITY)
        if packed is not None:
            flat_words, palette, zw = packed
        else:
            zp = zw * 3
            vals = self.values
            if zp != z_dim:
                vals = np.concatenate(
                    [vals, np.zeros((x_dim, y_dim, zp - z_dim), np.int32)],
                    axis=2,
                )
            uniq = np.unique(vals)
            uniq = uniq[uniq != 0]
            assert len(uniq) < PALETTE_CAPACITY, "scene not palettized"
            palette = np.zeros(PALETTE_CAPACITY, np.int32)
            palette[1 : 1 + len(uniq)] = uniq
            # values -> slots via searchsorted over sorted unique values
            flat = vals.reshape(-1)
            slots = np.zeros(flat.shape, np.int64)
            nz = flat != 0
            slots[nz] = np.searchsorted(uniq, flat[nz]) + 1

            idx3 = slots.reshape(x_dim, y_dim, zw, 3)
            words = (
                (idx3 << np.array([0, 10, 20], np.int64)).sum(axis=3)
            ).astype(np.uint32)
            flat_words = words.reshape(-1).view(np.int32)
        # minimum 16 rows: the kernel's window serve slices 16 at a time
        # pillar layout: 4x4 (x, y) column blocks with contiguous z —
        # a ray neighborhood touches ~2x fewer 128-word rows than with
        # plain row-major (x, y) ordering, halving serve rounds in the
        # kernel.  dims are padded to multiples of 8, so 4 divides.
        assert x_dim % 4 == 0 and y_dim % 4 == 0
        flat_words = (
            flat_words.reshape(x_dim // 4, 4, y_dim // 4, 4, zw)
            .transpose(0, 2, 1, 3, 4)
            .reshape(-1)
        )
        n_rows = max(16, _ceil_multiple(len(flat_words), 128) // 128)
        padded = np.zeros(n_rows * 128, np.int32)
        padded[: len(flat_words)] = flat_words

        # Empty-space-skip level: one occupancy bit per (2^shift)^3-cell
        # block, 32 bits packed along z per word.  The shift is chosen
        # per scene: the largest block size that is still mostly empty
        # skips the most cells per jump; dense-at-every-scale scenes
        # disable the level entirely (use_l2 False downstream).
        l2_shift = 3
        for shift in (3, 2, 1):
            if len(self.mips) > shift and float(self.mips[shift].mean()) < 0.35:
                l2_shift = shift
                break
        block = (
            self.mips[l2_shift]
            if len(self.mips) > l2_shift
            else (self.values != 0)
        )
        bx, by, bz = block.shape
        bzw = -(-bz // 32)
        l2_flat = native.block_bits(self.values, l2_shift)
        if l2_flat is None:
            bits = np.zeros((bx, by, bzw * 32), bool)
            bits[:, :, :bz] = block
            l2_words = np.zeros((bx, by, bzw), np.uint32)
            for b in range(32):
                l2_words |= (
                    bits[:, :, b::32].astype(np.uint32) << np.uint32(b)
                )
            l2_flat = l2_words.reshape(-1).view(np.int32)
        l2_rows = max(1, _ceil_multiple(len(l2_flat), 128) // 128)
        l2_padded = np.zeros(l2_rows * 128, np.int32)
        l2_padded[: len(l2_flat)] = l2_flat

        return {
            "packed_idx": padded.reshape(n_rows, 128),
            "palette": palette.reshape(8, 128),
            "zw": zw,
            "l2": l2_padded.reshape(l2_rows, 128),
            "l2_dims": (bx, by, bz),
            "l2_zw": bzw,
            "l2_shift": l2_shift,
            "l2_occupancy": float(block.mean()),
        }


def _quantize_leaves(leaves: np.ndarray) -> np.ndarray:
    """Map leaf values into at most PALETTE_CAPACITY - 1 distinct values.

    Lossless whenever the scene already has < PALETTE_CAPACITY distinct
    leaves (every .vox scene: <= 512).  Beyond that (the random-colored
    procedural bowl), colors snap to the centers of an 8x8x7 RGB cube
    per material byte — a bounded, unbiased quantization (a hash-bucket
    scheme would bias each bucket toward its representative's hue).
    """
    uniq = np.unique(leaves)
    if len(uniq) < PALETTE_CAPACITY:
        return leaves
    v = leaves.astype(np.int64)
    mat = (v >> 24) & 0x7F
    r = (v >> 16) & 0xFF
    g = (v >> 8) & 0xFF
    b = v & 0xFF
    # 8 x 8 x 7 level centers per material (<= 2 material bytes in
    # practice: diffuse / emissive), 896 < PALETTE_CAPACITY - 1
    rq = (r >> 5) * 32 + 16
    gq = (g >> 5) * 32 + 16
    bq = (2 * np.minimum(b * 7 // 256, 6) + 1) * 256 // 14
    out = (1 << 31) | (mat << 24) | (rq << 16) | (gq << 8) | bq
    return (out - (1 << 32)).astype(np.int32)


def _build_mips(occ0: np.ndarray, num_mips: int) -> List[np.ndarray]:
    mips = [occ0]
    cur = occ0
    for _ in range(1, num_mips):
        if max(cur.shape) <= 1:
            break
        dims = [_ceil_multiple(s, 2) for s in cur.shape]
        if dims != list(cur.shape):
            padded = np.zeros(dims, dtype=bool)
            padded[: cur.shape[0], : cur.shape[1], : cur.shape[2]] = cur
            cur = padded
        cur = (
            cur.reshape(
                dims[0] // 2, 2, dims[1] // 2, 2, dims[2] // 2, 2
            ).any(axis=(1, 3, 5))
        )
        mips.append(cur)
    return mips
