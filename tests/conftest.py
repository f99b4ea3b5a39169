import os
import sys

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
# logic is exercised without TPU hardware (SURVEY.md §4).  The real-
# hardware lane (VOX_TPU=1 python -m pytest -m tpu) keeps the
# accelerator backend instead.
TPU_LANE = os.environ.get("VOX_TPU", "") == "1"
if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon site hook force-registers the TPU platform programmatically
# (overriding JAX_PLATFORMS), so pin the config back to CPU explicitly.
import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOX_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "vox")
REFERENCE_VOX_DIR = "/root/reference/vox"


def vox_dir() -> str:
    if os.path.isdir(VOX_DIR):
        return VOX_DIR
    return REFERENCE_VOX_DIR


def gbuf_hwc(d):
    """Planar Pallas G-buffer dict -> channels-last numpy for
    comparisons against the (H, W, 3) oracle / XLA twins."""
    import numpy as np

    out = {}
    for k, v in d.items():
        a = np.asarray(v)
        if k in ("color", "normal", "albedo"):
            a = np.moveaxis(a, 0, -1)
        out[k] = a
    return out
