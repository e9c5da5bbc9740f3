"""Repository path resolution (parity surface: reference blurr/paths.py:6-11,
which locates the repo root and the vendored open-pi-zero tree; here the
package IS the framework, so the anchors are the repo, the package, and the
bundled config tree)."""

from pathlib import Path

_PACKAGE_DIR = Path(__file__).resolve().parent


def package_root() -> Path:
    """Root of the blurr_tpu package (configs, bundled assets live here)."""
    return _PACKAGE_DIR


def repo_root() -> Path:
    """Root of this repository (one level above the package)."""
    return _PACKAGE_DIR.parent


def config_root() -> Path:
    """The bundled YAML/statistics config tree."""
    return _PACKAGE_DIR / "config"
