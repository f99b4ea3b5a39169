// voxnative — native scene-build kernels for voxtracer.
//
// The reference's host runtime is native (Rust): its hot loop converts
// voxel lists into the GPU octree (src/context.rs:710-773).  This is the
// TPU build's equivalent native path: one pass from a voxel list to the
// device tables (dense int32 grid, 3x10-bit packed palette-index words,
// block-occupancy bits) that the Pallas kernel consumes.  Python falls
// back to the numpy implementation when the library isn't built; both
// must produce bit-identical tables (tests/test_native.py).
//
// Build: make -C native   (produces libvoxnative.so; ctypes loads it)

#include <cstdint>
#include <algorithm>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Fill a dense int32 value grid from a voxel list.
//   pos:   n x 3 int16 voxel coordinates
//   leaf:  n int32 packed leaf values (pre-quantized by the caller)
//   grid:  (dx*dy*dz) int32, zero-initialized by the caller
// Later duplicates win, matching repeated octree insertion.
void vox_fill_grid(const int16_t* pos, const int32_t* leaf, int64_t n,
                   int32_t ox, int32_t oy, int32_t oz,
                   int64_t dx, int64_t dy, int64_t dz, int32_t* grid) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = (int64_t)pos[3 * i + 0] - ox;
    int64_t y = (int64_t)pos[3 * i + 1] - oy;
    int64_t z = (int64_t)pos[3 * i + 2] - oz;
    if (x < 0 || y < 0 || z < 0 || x >= dx || y >= dy || z >= dz) continue;
    grid[(x * dy + y) * dz + z] = leaf[i];
  }
}

// Map grid values to palette slots and pack 3 consecutive-z 10-bit
// slots per int32 word (word address (x*dy + y)*zw + z/3).
//   palette: out, cap int32 slots (slot 0 stays 0); returns the number
//            of distinct values, or -1 if the palette capacity overflows.
int64_t vox_pack_words(const int32_t* grid, int64_t dx, int64_t dy,
                       int64_t dz, int32_t* palette, int64_t cap,
                       int32_t* words /* dx*dy*zw, zeroed */) {
  const int64_t zw = (dz + 2) / 3;
  std::unordered_map<int32_t, int32_t> slot_of;
  slot_of.reserve(1024);
  // Slot numbering must match the numpy path: slots ordered by SORTED
  // unique value.  Two passes: collect uniques, sort, assign.
  std::vector<int32_t> uniq;
  {
    std::unordered_map<int32_t, bool> seen;
    seen.reserve(4096);
    const int64_t total = dx * dy * dz;
    for (int64_t i = 0; i < total; ++i) {
      int32_t v = grid[i];
      if (v != 0 && !seen[v]) {
        seen[v] = true;
        uniq.push_back(v);
      }
    }
  }
  if ((int64_t)uniq.size() >= cap) return -1;
  std::sort(uniq.begin(), uniq.end());
  for (size_t i = 0; i < uniq.size(); ++i) {
    palette[i + 1] = uniq[i];
    slot_of[uniq[i]] = (int32_t)(i + 1);
  }

  for (int64_t x = 0; x < dx; ++x) {
    for (int64_t y = 0; y < dy; ++y) {
      const int32_t* col = grid + (x * dy + y) * dz;
      int32_t* wout = words + (x * dy + y) * zw;
      for (int64_t z = 0; z < dz; ++z) {
        int32_t v = col[z];
        if (v == 0) continue;
        uint32_t slot = (uint32_t)slot_of[v];
        wout[z / 3] =
            (int32_t)((uint32_t)wout[z / 3] | (slot << (10 * (z % 3))));
      }
    }
  }
  return (int64_t)uniq.size();
}

// Block-occupancy bits: one bit per (2^shift)^3 block, 32 bits packed
// along block-z per word.  words must be zeroed, sized bx*by*ceil(bz/32).
void vox_block_bits(const int32_t* grid, int64_t dx, int64_t dy, int64_t dz,
                    int32_t shift, int32_t* words) {
  const int64_t bx = ((dx - 1) >> shift) + 1;
  const int64_t by = ((dy - 1) >> shift) + 1;
  const int64_t bz = ((dz - 1) >> shift) + 1;
  const int64_t bzw = (bz + 31) / 32;
  for (int64_t x = 0; x < dx; ++x) {
    for (int64_t y = 0; y < dy; ++y) {
      const int32_t* col = grid + (x * dy + y) * dz;
      for (int64_t z = 0; z < dz; ++z) {
        if (col[z] == 0) continue;
        int64_t bxx = x >> shift, byy = y >> shift, bzz = z >> shift;
        int64_t w = (bxx * by + byy) * bzw + (bzz >> 5);
        words[w] = (int32_t)((uint32_t)words[w] | (1u << (bzz & 31)));
      }
    }
  }
}

// Decode a MagicaVoxel XYZI payload (n * [x y z ci] bytes) into engine
// voxels: swizzled (x, z, y) int16 positions and palette indices.
void vox_decode_xyzi(const uint8_t* xyzi, int64_t n, int16_t* pos,
                     uint8_t* color_index) {
  for (int64_t i = 0; i < n; ++i) {
    pos[3 * i + 0] = xyzi[4 * i + 0];
    pos[3 * i + 1] = xyzi[4 * i + 2];  // vox is z-up: engine y <- vox z
    pos[3 * i + 2] = xyzi[4 * i + 1];
    color_index[i] = xyzi[4 * i + 3];
  }
}

}  // extern "C"
