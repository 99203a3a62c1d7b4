"""Native (C++) data-path components.

`get_io()` returns the compiled `_combo_io` module (PNG/JPEG decode with a
GIL-releasing thread pool) or None when it is not built / disabled via
COMBO_NATIVE_IO=0. Build with:

    cd combo_avs_tpu/native && python setup.py build_ext --inplace

or programmatically via `build()` (used by the test suite).
"""

from __future__ import annotations

import glob
import importlib.util
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_cached = False
_mod = None


def _find_built():
    hits = glob.glob(os.path.join(_DIR, "_combo_io*.so"))
    return hits[0] if hits else None


def get_io() -> Optional[object]:
    """The native module, or None (absent, stale, or COMBO_NATIVE_IO=0)."""
    global _cached, _mod
    if os.environ.get("COMBO_NATIVE_IO", "1") == "0":
        return None
    if _cached:
        return _mod
    _cached = True
    so = _find_built()
    if so is None:
        return None
    src = os.path.join(_DIR, "combo_io.cpp")
    if os.path.exists(src) and os.path.getmtime(so) < os.path.getmtime(src):
        return None  # stale binary: source edited since the build — rebuild
    spec = importlib.util.spec_from_file_location("_combo_io", so)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:  # pragma: no cover - corrupt/foreign-ABI build
        _mod = None
    return _mod


def build(quiet: bool = True) -> bool:
    """Compile the extension in place; returns success."""
    global _cached
    r = subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=_DIR,
        capture_output=quiet,
    )
    _cached = False
    return r.returncode == 0 and _find_built() is not None
