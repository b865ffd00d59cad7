"""Environment report (equivalent of Dassl's ``collect_env_info``,
called at reference ``train.py:174-175``)."""

import platform
import sys


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]}",
        f"platform: {platform.platform()}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            lines.append(f"jax devices: {jax.devices()}")
        except Exception as e:  # device discovery can fail off-accelerator
            lines.append(f"jax devices: unavailable ({e})")
    except ImportError:
        lines.append("jax: not installed")
    try:
        import numpy as np

        lines.append(f"numpy: {np.__version__}")
    except ImportError:
        pass
    return "\n".join(lines)
