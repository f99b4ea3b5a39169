import math

import numpy as np

from voxtracer.engine.camera import Camera


def test_axis_orthonormal():
    cam = Camera(direction=np.array([0.3, -0.2, 0.9]))
    r, u, f = cam.axis()
    for v in (r, u, f):
        assert abs(np.linalg.norm(v) - 1) < 1e-12
    assert abs(np.dot(r, u)) < 1e-12
    assert abs(np.dot(r, f)) < 1e-12
    assert abs(np.dot(u, f)) < 1e-12
    # right = worldUp x forward
    np.testing.assert_allclose(r, np.cross([0, 1, 0], f) / np.linalg.norm(np.cross([0, 1, 0], f)))


def test_axis_scaled_center_ray():
    """The ray through the viewport center points along forward."""
    cam = Camera(direction=np.array([0.0, 0.0, 1.0]))
    w, h = 640, 480
    r, u, fwd = cam.axis_scaled(w, h)
    center = (w / 2) * r - (h / 2) * u + fwd
    center /= np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-12)


def test_axis_scaled_fov():
    """Horizontal half-angle spans (w/h) * tan(fov/2) at the edge."""
    cam = Camera(direction=np.array([0.0, 0.0, 1.0]), fov=math.radians(70))
    w = h = 512
    r, u, fwd = cam.axis_scaled(w, h)
    edge = 0.0 * r - (h / 2) * u + fwd + (w / 2) * r  # middle-right edge... px=w
    # ray at px=w, py=h/2 makes angle fov/2 with forward
    ray = w * r - (h / 2) * u + fwd
    ray /= np.linalg.norm(ray)
    angle = math.acos(np.clip(np.dot(ray, [0, 0, 1]), -1, 1))
    assert abs(angle - math.radians(35)) < 1e-9


def test_yaw_pitch():
    cam = Camera().with_yaw_pitch(0.0, 0.0)
    np.testing.assert_allclose(cam.direction, [0, 0, 1], atol=1e-15)
    cam = Camera().with_yaw_pitch(math.pi / 2, 0.0)
    np.testing.assert_allclose(cam.direction, [1, 0, 0], atol=1e-12)
    cam = Camera().with_yaw_pitch(0.0, math.pi / 2)
    np.testing.assert_allclose(cam.direction, [0, 1, 0], atol=1e-12)
