"""Interactive terminal viewer — the winit/egui front end, TUI edition.

The reference presents through a winit window with an egui debug panel
(``src/main.rs``, ``src/context.rs:1692-1827``).  A TPU pod has no
display, but any ssh terminal does: frames render to 24-bit ANSI
half-block cells, the fly camera runs on the same key bindings
(WASD/QE move, arrow keys look — terminals deliver no mouse deltas or
key-up events, so look is arrow-stepped), and the debug panel's
parameters are live on number keys.

Controls:
  w/a/s/d/q/e  move (hold-ish: each keypress steps 1/fps of movement)
  arrows       look around
  [ / ]        sun yaw          - / =   sun strength
  ; / '        denoise radius   , / .   specularity
  m            cycle scene      r       reset accumulation
  p            save snapshot    ESC/ctrl-c  quit

Run: ``python -m voxtracer.app.viewer --scene menger --size 256x144``
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np

from ..engine.pipeline import Renderer
from ..utils import FpsCounter
from . import camera_paths
from .cli import available_scenes, load_scene
from .input import FlyController


def _halfblock_frame(img: np.ndarray) -> str:
    """(H, W, 3) u8 -> ANSI string, two pixel rows per text row."""
    h = img.shape[0] - (img.shape[0] % 2)
    top = img[0:h:2]
    bot = img[1:h:2]
    rows = []
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        rows.append("".join(cells) + "\x1b[0m")
    return "\n".join(rows)


def run_viewer(args) -> int:
    import curses

    scenes = ["default"] + available_scenes()
    scene_idx = (
        scenes.index(args.scene) if args.scene in scenes else 0
    )
    width, height = (int(v) for v in args.size.lower().split("x"))

    renderer = Renderer(
        scene=load_scene(scenes[scene_idx]),
        height=height,
        width=width,
        denoise_radius=args.denoise_radius,
        trace_impl=args.trace_impl,
    )
    ctl = FlyController()
    # start from a framing view of the scene
    cam0 = camera_paths.static(renderer.scene)(0.0)
    ctl.camera = cam0
    d = cam0.direction / np.linalg.norm(cam0.direction)
    ctl.pitch = float(np.arcsin(d[1]))
    ctl.yaw = float(np.arctan2(d[0], d[2]))

    def loop(stdscr):
        curses.curs_set(0)
        stdscr.nodelay(True)
        fps = FpsCounter()
        nonlocal scene_idx
        step = 1.0 / 15.0
        look = 40.0  # pixels per arrow tap
        while True:
            # drain input
            while True:
                ch = stdscr.getch()
                if ch == -1:
                    break
                if ch in (27,):  # ESC
                    return
                key = {
                    curses.KEY_UP: ("look", 0, -look),
                    curses.KEY_DOWN: ("look", 0, look),
                    curses.KEY_LEFT: ("look", -look, 0),
                    curses.KEY_RIGHT: ("look", look, 0),
                }.get(ch)
                if key is not None:
                    ctl.cursor_grabbed = True
                    ctl.mouse_delta(key[1], key[2])
                    continue
                c = chr(ch) if 0 < ch < 256 else ""
                if c in "wasdqe":
                    ctl.pressed = {c}
                    ctl.update(step)
                    ctl.pressed = set()
                elif c == "[":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        sun_yaw=renderer.render_params.sun_yaw - 0.1,
                    )
                elif c == "]":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        sun_yaw=renderer.render_params.sun_yaw + 0.1,
                    )
                elif c == "-":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        sun_strength=max(
                            0.0, renderer.render_params.sun_strength - 0.5
                        ),
                    )
                elif c == "=":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        sun_strength=min(
                            10.0, renderer.render_params.sun_strength + 0.5
                        ),
                    )
                elif c == ",":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        specularity=max(
                            0.0, renderer.render_params.specularity - 0.1
                        ),
                    )
                elif c == ".":
                    renderer.render_params = dataclasses.replace(
                        renderer.render_params,
                        specularity=min(
                            1.0, renderer.render_params.specularity + 0.1
                        ),
                    )
                elif c == "m":
                    scene_idx = (scene_idx + 1) % len(scenes)
                    try:
                        renderer.set_scene(load_scene(scenes[scene_idx]))
                    except Exception:
                        # keep rendering the old scene, like the
                        # reference's vox-load failure path
                        # (src/context.rs:1817-1818)
                        pass
                elif c == "r":
                    renderer.reset_accumulation()
                elif c == "p":
                    from ..engine import snapshot

                    snapshot.save("viewer_snapshot.npz", renderer, ctl.camera)

            cam = ctl.update(0.0)
            out = renderer.render(cam)
            img = np.asarray(out["image"])
            fps.tick()

            rows, cols = stdscr.getmaxyx()
            vis_w = min(img.shape[1], cols - 1)
            vis_h = min(img.shape[0], 2 * (rows - 2))
            frame = _halfblock_frame(img[:vis_h, :vis_w])
            stdscr.erase()
            try:
                for i, line in enumerate(frame.split("\n")):
                    stdscr.addstr(i, 0, line)
                status = (
                    f" {scenes[scene_idx]} {width}x{height} "
                    f"fps:{fps.fps:5.1f} sun:{renderer.render_params.sun_strength:.1f} "
                    f"spec:{renderer.render_params.specularity:.1f} "
                    f"[wasdqe move, arrows look, m scene, ESC quit]"
                )
                stdscr.addstr(min(rows - 1, vis_h // 2 + 1), 0, status[: cols - 1])
            except curses.error:
                pass
            stdscr.refresh()

    import curses

    curses.wrapper(loop)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="menger")
    p.add_argument("--size", default="192x108")
    p.add_argument("--denoise-radius", type=int, default=0)
    p.add_argument("--trace-impl", default=None, choices=["pallas", "xla"])
    args = p.parse_args(argv)
    if not sys.stdout.isatty():
        print("viewer needs an interactive terminal", file=sys.stderr)
        return 1
    return run_viewer(args)


if __name__ == "__main__":
    sys.exit(main())
