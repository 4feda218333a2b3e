"""Run-directory code snapshot.

Reference: ``save_code`` (``/root/reference/utils.py:48-57``) copies every source
file into the run directory and dumps the resolved config as YAML, so each run is
exactly reproducible from its own artifacts. Here the snapshot covers the whole
``wt_pse_tpu`` package plus the invoking script.
"""

from __future__ import annotations

import os
import shutil

import yaml


def save_code(out_dir: str, hparams: dict | None = None,
              extra_files: list[str] | None = None) -> str:
    """Snapshot the framework source + resolved hparams into ``out_dir/code``."""
    import wt_pse_tpu

    code_dir = os.path.join(out_dir, "code")
    pkg_root = os.path.dirname(os.path.abspath(wt_pse_tpu.__file__))
    dst_pkg = os.path.join(code_dir, "wt_pse_tpu")
    if os.path.exists(dst_pkg):
        shutil.rmtree(dst_pkg)
    shutil.copytree(pkg_root, dst_pkg,
                    ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))
    for f in extra_files or []:
        if os.path.exists(f):
            shutil.copy2(f, code_dir)
    if hparams is not None:
        with open(os.path.join(code_dir, "config_resolved.yaml"), "w") as fh:
            yaml.safe_dump({k: v for k, v in dict(hparams).items()}, fh)
    return code_dir
