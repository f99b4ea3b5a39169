"""Logging setup: structured-ish console logging with env-var filtering.

Mirrors the reference's tracing-subscriber configuration
(``src/main.rs:50-66``): WARN default, the engine's own namespace at
INFO, overridable via an env filter (``VOXTRACER_LOG``, the RUST_LOG
analog; e.g. ``debug`` or ``voxtracer.ops=debug``).
"""

from __future__ import annotations

import logging
import os


def setup_logging(env_var: str = "VOXTRACER_LOG") -> None:
    logging.basicConfig(
        level=logging.WARNING,
        format="%(asctime)s %(levelname)-7s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    logging.getLogger("voxtracer").setLevel(logging.INFO)

    spec = os.environ.get(env_var, "")
    for clause in filter(None, (c.strip() for c in spec.split(","))):
        if "=" in clause:
            name, _, level = clause.partition("=")
            logging.getLogger(name).setLevel(level.upper())
        else:
            logging.getLogger().setLevel(clause.upper())
            logging.getLogger("voxtracer").setLevel(clause.upper())
