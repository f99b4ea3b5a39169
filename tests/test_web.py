"""Browser live-viewer frontend: HTTP surface + event routing.

Covers the interactive-parity layer (continuous mouse-look, key-state
flying, absolute slider sets — the winit/egui capabilities of
``src/context.rs:1517-1560, 1692-1827``) without a browser: the tests
drive the HTTP endpoints directly against a tiny CPU-rendered scene.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from voxtracer.app.input import FlyController
from voxtracer.app.web import PARAM_SPECS, WebViewer, serve
from voxtracer.engine.pipeline import Renderer
from voxtracer.scene import GridScene, VoxelList


def _tiny_scene():
    vl = VoxelList(
        pos=np.array([[0, 0, 0], [1, 1, 1]], dtype=np.int16),
        mrgb=np.array([[0, 200, 0, 0], [0, 0, 200, 0]], dtype=np.uint8),
    )
    return GridScene.from_voxels(vl)


@pytest.fixture(scope="module")
def viewer_server():
    r = Renderer(scene=_tiny_scene(), height=24, width=32,
                 trace_impl="xla")
    viewer = WebViewer(r, scenes=["default"])
    server = serve(viewer, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    viewer.render_once()  # publish one frame without the loop thread
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield viewer, base
    server.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as resp:
        return resp.status, resp.headers, resp.read()


def _post(base, ev):
    req = urllib.request.Request(
        base + "/input", data=json.dumps(ev).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status


def test_page_and_state(viewer_server):
    viewer, base = viewer_server
    status, _, body = _get(base, "/")
    assert status == 200 and b"pointerlock" in body.lower()
    status, _, body = _get(base, "/state")
    st = json.loads(body)
    assert status == 200
    assert st["size"] == [32, 24]
    # every slider the page shows is present in the state snapshot
    for name in PARAM_SPECS:
        assert name in st["params"], name
    assert st["params"]["sun_strength"] == 4.0  # reference default


def test_frame_endpoint_serves_image(viewer_server):
    viewer, base = viewer_server
    status, headers, body = _get(base, "/frame")
    assert status == 200
    assert headers["Content-Type"] in ("image/jpeg", "image/png")
    assert body[:2] == b"\xff\xd8" or body[:8] == b"\x89PNG\r\n\x1a\n"


def test_input_events_drive_controller_and_params(viewer_server):
    viewer, base = viewer_server
    cam0 = np.array(viewer.ctl.camera.position)
    assert _post(base, {"type": "keydown", "key": "w"}) == 200
    viewer.ctl.update(1.0)
    assert _post(base, {"type": "keyup", "key": "w"}) == 200
    moved = np.array(viewer.ctl.camera.position)
    assert np.linalg.norm(moved - cam0) == pytest.approx(5.0)  # 5 u/s

    # pointer-locked look at the reference's 0.001 rad/px
    assert _post(base, {"type": "grab", "grabbed": True}) == 200
    assert _post(base, {"type": "look", "dx": 100, "dy": 0}) == 200
    assert viewer.ctl.yaw == pytest.approx(0.1)

    # absolute slider set with clamping to the egui range
    assert _post(base, {"type": "param", "name": "sun_strength",
                        "value": 99.0}) == 200
    assert viewer.renderer.render_params.sun_strength == 10.0
    assert _post(base, {"type": "param", "name": "denoise_radius",
                        "value": 3}) == 200
    assert viewer.renderer.denoise_radius == 3
    assert _post(base, {"type": "color", "name": "sun_color",
                        "value": [0.5, 0.25, 1.5]}) == 200
    assert viewer.renderer.render_params.sun_color == (0.5, 0.25, 1.0)

    # unknown params/scenes are ignored, not 500s
    assert _post(base, {"type": "param", "name": "nope", "value": 1}) == 200
    assert _post(base, {"type": "scene", "name": "missing-scene"}) == 200


def test_render_once_publishes_frames(viewer_server):
    viewer, base = viewer_server
    n0 = viewer.frame_no
    viewer.render_once()
    data, mime, n1 = viewer.wait_frame(n0)
    assert n1 == n0 + 1 and len(data) > 100


@pytest.mark.slow
def test_live_resize_roundtrip(viewer_server):
    """A size event rebuilds the renderer at the new resolution and
    the next published frame has the new dims; params and camera
    survive (VERDICT r3 next #4; src/context.rs:1430-1461)."""
    viewer, base = viewer_server
    r = viewer.renderer
    sun0 = r.render_params.sun_strength
    pos0 = np.array(viewer.ctl.camera.position)

    assert _post(base, {"type": "size", "width": 48, "height": 32}) == 200
    viewer.render_once()  # owner thread applies the pending size
    assert (r.height, r.width) == (32, 48)
    assert np.asarray(r.state["accum_color"]).shape == (3, 32, 48)
    st = json.loads(_get(base, "/state")[2])
    assert st["size"] == [48, 32]
    assert r.render_params.sun_strength == sun0
    np.testing.assert_array_equal(
        np.array(viewer.ctl.camera.position), pos0
    )
    # absurd sizes are ignored, not applied
    assert _post(base, {"type": "size", "width": 0, "height": 9}) == 200
    viewer.render_once()
    assert (r.height, r.width) == (32, 48)
    # back to the original size for the other module-scoped tests
    assert _post(base, {"type": "size", "width": 32, "height": 24}) == 200
    viewer.render_once()
    assert (r.height, r.width) == (24, 32)


def test_param_specs_cover_reference_panel():
    """Every egui slider (src/context.rs:1692-1827) has a binding."""
    expected = {
        "sun_yaw", "sun_pitch", "sun_size", "sun_strength",
        "emit_strength", "specularity", "sample_blending",
        "maximum_blending", "blending_distance_cutoff",
        "sigma_distance", "sigma_range", "albedo_factor",
        "denoise_radius",
    }
    assert expected <= set(PARAM_SPECS)
