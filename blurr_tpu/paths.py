"""Repository path resolution (parity surface: reference blurr/paths.py:6-11)."""

from pathlib import Path


def repo_root() -> Path:
    """Root of this repository."""
    return Path(__file__).resolve().parents[1]


def package_root() -> Path:
    """Root of the blurr_tpu package (configs, bundled assets live here)."""
    return Path(__file__).resolve().parent


def config_root() -> Path:
    return package_root() / "config"
