"""--legacy-whitted CLI path: end-to-end still render through cli.main."""


def test_cli_legacy_whitted_render(tmp_path):
    from voxtracer.app import cli

    out = tmp_path / "whitted.png"
    rc = cli.main(
        [
            "--scene",
            "8x8x8",
            "--legacy-whitted",
            "--size",
            "24x16",
            "--camera-pos",
            "6,5,-8",
            "--light",
            "4,8,-6,60",
            "-o",
            str(out),
        ]
    )
    assert rc == 0
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
