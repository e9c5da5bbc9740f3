"""Import shims (parity surface: reference blurr/imports.py:8-12).

The reference vendors open-pi-zero under third_party/ and splices it onto
sys.path; this framework is fully native, so the shim only ensures the repo
root itself is importable (useful for scripts executed from elsewhere)."""

from __future__ import annotations

import sys

from blurr_tpu.paths import repo_root


def ensure_repo_on_path() -> None:
    root = str(repo_root())
    if root not in sys.path:
        sys.path.insert(0, root)


# Kept under the reference's name so downstream code ports unchanged; the
# vendored tree does not exist here, everything lives in blurr_tpu.
def ensure_open_pi_zero_on_path() -> None:
    ensure_repo_on_path()
