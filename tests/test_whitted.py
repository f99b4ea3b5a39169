"""Legacy Whitted raytracer (ops/whitted.py) vs an independent
brute-force voxel intersector.

Ground truth here is NOT the octree traversal: every filled voxel's
world AABB (voxel ``p`` occupies ``[p/2, (p+1)/2)`` — the legacy
shader's half-scale geometry) is slab-tested directly in numpy and the
nearest hit wins.  Agreement validates the sorted-octant ordering, the
stack machine, the ABI addressing, and the world mapping at once.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from voxtracer.engine.camera import Camera
from voxtracer.ops import whitted
from voxtracer.scene.octree import build_octree
from voxtracer.scene.voxels import VoxelList


def _voxel_list(pos, rgb):
    mrgb = np.zeros((len(pos), 4), np.uint8)
    mrgb[:, 0] = 0
    mrgb[:, 1:] = rgb
    return VoxelList(pos=np.asarray(pos, np.int16), mrgb=mrgb)


def _brute_force(pos, rgb, origin, direction):
    """Nearest voxel hit by direct slab tests; returns
    (hit, time, color, normal) with basic.frag's hit rule
    (exit >= 0 and entry < exit, time = entry)."""
    lo = pos.astype(np.float64) / 2.0
    hi = lo + 0.5
    inv = 1.0 / direction
    t0 = (lo - origin) * inv
    t1 = (hi - origin) * inv
    tmin = np.minimum(t0, t1)
    tmax = np.maximum(t0, t1)
    entry_ax = np.argmax(tmin, axis=1)
    entry = tmin.max(axis=1)
    exit_ = tmax.min(axis=1)
    ok = (exit_ >= 0) & (entry < exit_)
    if not ok.any():
        return False, 0.0, None, None
    idx = np.flatnonzero(ok)[np.argmin(entry[ok])]
    axis = entry_ax[idx]
    normal = np.zeros(3)
    normal[axis] = -np.sign(direction[axis])
    return True, entry[idx], rgb[idx] / 255.0, normal


def _random_scene(rng, n=60, span=8):
    pos = rng.integers(-span, span, size=(n, 3))
    pos = np.unique(pos, axis=0)
    rgb = rng.integers(1, 256, size=(len(pos), 3))
    return pos, rgb


def test_cast_ray_matches_brute_force():
    rng = np.random.default_rng(7)
    pos, rgb = _random_scene(rng)
    octree = jnp.asarray(build_octree(_voxel_list(pos, rgb)))
    header = np.asarray(octree[:5]).view(np.float32)
    nodes = octree[5:]

    cast = jax.jit(
        jax.vmap(
            lambda o, d: whitted.cast_ray(
                nodes, jnp.asarray(header[:3]), jnp.float32(header[3]), o, d
            )
        )
    )

    n_rays = 400
    # Origins outside the root cube looking inward, generic irrational-ish
    # directions (no axis-aligned / cell-boundary ties).
    origins = rng.normal(size=(n_rays, 3))
    origins = origins / np.linalg.norm(origins, axis=1, keepdims=True) * 9.0
    targets = rng.uniform(-3.0, 3.0, size=(n_rays, 3)) + 0.123456
    dirs = targets - origins
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)

    hit, time, color, normal = cast(
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32)
    )
    hit = np.asarray(hit)
    time = np.asarray(time)
    color = np.asarray(color)
    normal = np.asarray(normal)

    mismatches = 0
    for k in range(n_rays):
        bf_hit, bf_t, bf_c, bf_n = _brute_force(pos, rgb, origins[k], dirs[k])
        if bf_hit != bool(hit[k]):
            mismatches += 1
            continue
        if bf_hit:
            assert abs(bf_t - time[k]) < 1e-3, (k, bf_t, time[k])
            np.testing.assert_allclose(color[k], bf_c, atol=1e-6)
            np.testing.assert_allclose(normal[k], bf_n, atol=0)
    # f32 traversal vs f64 brute force may flip grazing rays; keep a
    # pinned absolute budget (measured 0 on this seed).
    assert mismatches == 0, f"{mismatches}/{n_rays} hit-flag mismatches"


def test_render_background_is_abs_dir():
    octree = jnp.asarray(build_octree(_voxel_list(np.zeros((0, 3)), np.zeros((0, 3)))))
    cam = Camera(position=np.array([0.0, 0.0, -6.0]))
    right, up, forward = cam.axis_scaled(16, 16)
    img = whitted.render_whitted(
        octree,
        jnp.asarray(cam.position, jnp.float32),
        jnp.asarray(right, jnp.float32),
        jnp.asarray(up, jnp.float32),
        jnp.asarray(forward, jnp.float32),
        jnp.zeros(3, jnp.float32),
        jnp.float32(0.05),
        width=16,
        height=16,
    )
    img = np.asarray(img)
    # Empty scene: every pixel is abs(normalized ray dir)  (basic.frag:269)
    px, py = 8.5, 3.5
    d = px * right - py * up + forward
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(img[3, 8], np.abs(d), atol=1e-6)


def test_shading_formula_point_light():
    # One voxel at the origin cell [0, 0.5)^3; light straight up the -z
    # axis from the camera side; verify the diffuse/shadow-free formula
    # (basic.frag:254-267) against a direct numpy evaluation.
    pos = np.array([[0, 0, 0]])
    rgb = np.array([[200, 100, 50]])
    vl = _voxel_list(pos, rgb)
    cam = Camera(position=np.array([0.25, 0.25, -4.0]),
                 direction=np.array([0.0, 0.0, 1.0]))
    W = H = 9
    img = np.asarray(whitted.render_scene(
        vl, cam, W, H, light_pos=(0.25, 0.25, -2.0), light_brightness=2.0))

    right, up, forward = cam.axis_scaled(W, H)
    cx = W // 2
    d = (cx + 0.5) * right - (cx + 0.5) * up + forward
    d = d / np.linalg.norm(d)
    # center ray hits the front face z=0 at t = 4.0 / d_z
    t = (0.0 - cam.position[2]) / d[2]
    hit_point = cam.position + d * (0.99999 * t)
    to_hit = hit_point - np.array([0.25, 0.25, -2.0])
    dist = np.linalg.norm(to_hit)
    ldir = to_hit / dist
    diffuse = 0.8 * 2.0 * max(0.0, np.dot(-ldir, np.array([0, 0, -1.0]))) / dist**2
    expect = (rgb[0] / 255.0) * (0.2 + diffuse)
    np.testing.assert_allclose(img[cx, cx], expect, rtol=1e-4)


def test_shadow_darkens():
    # A floor slab plus a blocker between light and floor: the shadowed
    # texel takes the 0.3*diffuse arm (basic.frag:266).
    floor = [(x, -2, z) for x in range(-4, 5) for z in range(-4, 5)]
    blocker = [(0, 2, 0)]
    pos = np.array(floor + blocker)
    rgb = np.full((len(pos), 3), 180)
    vl = _voxel_list(pos, rgb)
    cam = Camera(position=np.array([0.1, 3.0, -5.0]),
                 direction=np.array([0.0, -0.55, 1.0]))
    # Light directly above the blocker: the floor texel under it is
    # occluded, its neighbours are lit.
    img = np.asarray(whitted.render_scene(
        vl, cam, 65, 65, light_pos=(0.25, 3.0, 0.25), light_brightness=6.0))
    assert np.isfinite(img).all()
    lum = img.sum(axis=2)
    assert lum.max() > 0
    # Find the darkest floor-ish region: must be meaningfully darker than
    # the brightest (shadow arm multiplies diffuse by 0.3).
    hit_mask = lum > 0
    assert hit_mask.any()
    assert lum[hit_mask].min() < 0.6 * lum[hit_mask].max()
