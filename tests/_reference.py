"""Utilities to load the read-only PyTorch reference for parity testing.

We import the reference's model files directly from /root/reference (never
copying them) to generate golden outputs.  The reference package's own
``models/__init__.py`` is broken (imports a module with no source), so we
register a synthetic parent package and import submodules individually.
Tests that need the reference must call ``require_reference()`` and are
skipped when it is not mounted.
"""

import importlib
import importlib.util
import os
import sys
import types

import pytest

REFERENCE_ROOT = os.environ.get("DFC_REFERENCE_ROOT", "/root/reference")
_PKG = "refmodels"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def require_reference():
    if not reference_available():
        pytest.skip("PyTorch reference repo not mounted")


def _ensure_pkg():
    if _PKG in sys.modules:
        return sys.modules[_PKG]
    pkg = types.ModuleType(_PKG)
    pkg.__path__ = [os.path.join(REFERENCE_ROOT, "models")]
    pkg.__package__ = _PKG
    sys.modules[_PKG] = pkg
    return pkg


def load_ref_module(name: str):
    """Import e.g. 'unet_dfc_sa_res' from the reference models dir."""
    require_reference()
    _ensure_pkg()
    return importlib.import_module(f"{_PKG}.{name}")


def load_ref_utils(name: str):
    """Import e.g. 'metrics' from the reference utils dir (these import as
    'utils.metrics' internally, so register a 'refutils' package)."""
    require_reference()
    pkg_name = "refutils"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "utils")]
        pkg.__package__ = pkg_name
        sys.modules[pkg_name] = pkg
    return importlib.import_module(f"{pkg_name}.{name}")
