import glob
import os

import numpy as np
import pytest

from conftest import vox_dir
from voxtracer.io import vox as voxio
from voxtracer.io.palette import DEFAULT_PALETTE

ALL_VOX = sorted(glob.glob(os.path.join(vox_dir(), "*.vox")))


def test_assets_present():
    assert len(ALL_VOX) == 15


@pytest.mark.parametrize("path", ALL_VOX, ids=[os.path.basename(p) for p in ALL_VOX])
def test_parse_asset(path):
    v = voxio.load(path)
    assert len(v.models) >= 1
    model = v.models[0]
    assert model.voxels.shape[1] == 4
    assert len(model.voxels) > 0
    sx, sy, sz = model.size
    assert (model.voxels[:, 0] < sx).all()
    assert (model.voxels[:, 1] < sy).all()
    assert (model.voxels[:, 2] < sz).all()
    assert v.palette.shape == (256,)
    # All shipped assets carry a full 256-entry MATL set.
    assert len(v.materials) == 256


def test_default_palette_structure():
    # Spot checks against the MagicaVoxel default palette constants
    # (values as embedded in the reference, src/vox.rs:103-136).
    p = DEFAULT_PALETTE
    assert p[0] == 0x00000000
    assert p[1] == 0xFFFFFFFF
    assert p[2] == 0xFFCCFFFF
    assert p[6] == 0xFF00FFFF
    assert p[7] == 0xFFFFCCFF
    assert p[36] == 0xFF0000FF
    assert p[37] == 0xFFFFFFCC
    assert p[215] == 0xFF330000
    assert p[216] == 0xFF0000EE
    assert p[226] == 0xFF00EE00
    assert p[236] == 0xFFEE0000
    assert p[246] == 0xFFEEEEEE
    assert p[255] == 0xFF111111


def test_color_rgb_low_byte_is_red():
    v = voxio.Vox(models=[], palette=DEFAULT_PALETTE, materials={})
    rgb = v.color_rgb(216)  # 0xFF0000EE -> red 0xEE
    assert list(rgb) == [0xEE, 0x00, 0x00]


def test_bad_magic_rejected():
    with pytest.raises(voxio.VoxError):
        voxio.parse(b"NOPE" + b"\x00" * 100)


def test_bad_version_rejected():
    import struct

    data = b"VOX " + struct.pack("<i", 99)
    with pytest.raises(voxio.VoxError):
        voxio.parse(data)


def test_rgba_chunk_applied():
    import struct

    def chunk(ident, content, children=b""):
        return ident + struct.pack("<II", len(content), len(children)) + content + children

    size = chunk(b"SIZE", struct.pack("<III", 1, 1, 1))
    xyzi = chunk(b"XYZI", struct.pack("<I", 1) + bytes([0, 0, 0, 1]))
    rgba = chunk(b"RGBA", b"".join(struct.pack("<I", 0xFF000000 | i) for i in range(1, 256)))
    main = chunk(b"MAIN", b"", size + xyzi + rgba)
    data = b"VOX " + struct.pack("<i", 150) + main
    v = voxio.parse(data)
    assert v.palette[1] == 0xFF000001
    assert v.palette[255] == 0xFF0000FF
    assert v.palette[0] == 0  # slot 0 untouched
