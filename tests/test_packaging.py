"""Packaging metadata: pyproject.toml stays consistent with the code it ships.

The reference has no packaging at all (flat scripts, `python train.py`); the
framework is a real installable package, so these tests pin the contract:
every declared console script resolves to an importable callable, the version
strings agree, and the native C++ source is listed as package data (it is
compiled on first import, so it MUST ship with the wheel/sdist).
"""

import importlib
import os
import tomllib

import wt_pse_tpu

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(_ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert set(scripts) == {"wt-pse-train", "wt-pse-eval", "wt-pse-sweep"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_version_matches_package():
    assert _pyproject()["project"]["version"] == wt_pse_tpu.__version__


def test_native_source_ships_as_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["wt_pse_tpu.native"]
    # and the file it refers to exists where build-on-import expects it
    assert os.path.exists(
        os.path.join(_ROOT, "wt_pse_tpu", "native", "evalops.cpp"))
