import numpy as np
import jax.numpy as jnp

from voxtracer.io.image import write_png
from voxtracer.ops.tonemap import srgb_encode, to_u8


def test_srgb_reference_points():
    x = jnp.asarray([0.0, 0.0031308, 0.5, 1.0, 2.0, -1.0])
    y = np.asarray(srgb_encode(x))
    assert y[0] == 0.0
    np.testing.assert_allclose(y[1], 12.92 * 0.0031308, rtol=1e-6)
    np.testing.assert_allclose(y[2], 1.055 * 0.5 ** (1 / 2.4) - 0.055, rtol=1e-6)
    np.testing.assert_allclose(y[3], 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[4], 1.0, rtol=1e-6)  # clamped
    assert y[5] == 0.0  # clamped


def test_to_u8_round_trip_monotonic():
    lin = jnp.linspace(0, 1, 256)[None, :, None].repeat(3, axis=2)
    u8 = np.asarray(to_u8(lin))
    assert u8.dtype == np.uint8
    assert (np.diff(u8[0, :, 0].astype(int)) >= 0).all()
    assert u8[0, 0, 0] == 0 and u8[0, -1, 0] == 255


def test_png_writer_grayscale_and_rgba(tmp_path):
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    write_png(tmp_path / "g.png", g)
    rgba = np.zeros((4, 4, 4), np.uint8)
    write_png(tmp_path / "rgba.png", rgba)
    for name in ("g.png", "rgba.png"):
        data = (tmp_path / name).read_bytes()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IEND" in data
