import os
import tempfile

import numpy as np
import pytest

from voxtracer.io.f32zip import read_f32zip, write_f32zip
from voxtracer.ops import bluenoise
from voxtracer.ops import noise as noise_op


def test_noise_plane_indexing():
    """plane[k][y,x] must equal buffer[(frame+1+k) % S, y % 128, x % 128]
    (the reference's rand() slice advance, voxels.comp:268-275)."""
    buf = noise_op.white_noise_buffer(seed=3, count=16, size=8)
    planes = noise_op.noise_planes(buf, frame=7, height=20, width=11, count=5)
    assert planes.shape == (5, 20, 11)
    for k in range(5):
        s = (7 + 1 + k) % 16
        for y, x in [(0, 0), (7, 7), (13, 9), (19, 10)]:
            assert planes[k, y, x] == buf[s, y % 8, x % 8]


def test_f32zip_roundtrip():
    noise = np.random.default_rng(0).random((4, 16, 16)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bn.zip")
        write_f32zip(path, noise)
        back = read_f32zip(path)
    np.testing.assert_array_equal(noise, back)


def test_bluenoise_small():
    """Tiny void-and-cluster bake: values are a permutation of
    (rank+0.5)/N and the spectrum is blue (energy pushed to high
    frequencies)."""
    size = 16
    noise = bluenoise.generate(count=2, size=size, seed=1)
    assert noise.shape == (2, size, size)
    n = size * size
    for s in range(2):
        vals = np.sort(noise[s].reshape(-1))
        np.testing.assert_allclose(vals, (np.arange(n) + 0.5) / n, atol=1e-6)

    # spectral check: thresholded binary pattern should have little
    # low-frequency energy relative to white noise
    pat = (noise[0] < 0.25).astype(np.float64)
    pat -= pat.mean()
    spec = np.abs(np.fft.fft2(pat)) ** 2
    freq = np.fft.fftfreq(size)
    fy, fx = np.meshgrid(freq, freq, indexing="ij")
    rad = np.sqrt(fy**2 + fx**2)
    low = spec[(rad < 0.15) & (rad > 0)].mean()
    high = spec[rad > 0.3].mean()
    assert high > 2.0 * low, f"not blue: low {low}, high {high}"


def test_noise_quads_match_noise_planes():
    """The periodic quad table must reproduce noise_planes exactly:
    quad (qi % P, qj % P) reshaped to the (TILE_H, 128) lane plane is
    the lane-layout image of pixel block (qi, qj)."""
    import jax.numpy as jnp

    from voxtracer.ops import trace_pallas as tp
    from voxtracer.ops.noise import noise_planes, white_noise_buffer

    buf = white_noise_buffer(seed=9, count=32)
    frame = 5
    h = w = 256  # 4x4 pixel blocks of BLOCK=64 -> every quad reused
    planes = noise_planes(buf, frame, h, w)
    quads = np.asarray(tp.noise_quads(jnp.asarray(buf), jnp.int32(frame)))
    P = 128 // tp.BLOCK
    for k in (0, 7, 23):
        for bi in range(h // tp.BLOCK):
            for bj in range(w // tp.BLOCK):
                blockpx = planes[
                    k,
                    bi * tp.BLOCK : (bi + 1) * tp.BLOCK,
                    bj * tp.BLOCK : (bj + 1) * tp.BLOCK,
                ]
                lane_plane = blockpx.reshape(tp.TILE_H, tp.TILE_W)
                np.testing.assert_array_equal(
                    quads[k, bi % P, bj % P], lane_plane
                )


def test_noise_quads_roll_matches_row_offset():
    """The sharded path pre-rolls the quads by the slab's global row
    offset; rolled quads must equal the unrolled quads of a slab whose
    rows start at that offset."""
    import jax.numpy as jnp

    from voxtracer.ops import trace_pallas as tp
    from voxtracer.ops.noise import noise_planes, white_noise_buffer

    buf = white_noise_buffer(seed=2, count=16)
    frame, row0 = 3, 90  # deliberately NOT a multiple of BLOCK
    rolled = np.asarray(
        tp.noise_quads(jnp.asarray(buf), jnp.int32(frame), roll=row0)
    )
    planes = noise_planes(buf, frame, row0 + 128, 128)
    slab = planes[:, row0 : row0 + tp.BLOCK, : tp.BLOCK]  # block (0,0)
    np.testing.assert_array_equal(
        rolled[:, 0, 0], slab.reshape(-1, tp.TILE_H, tp.TILE_W)
    )
