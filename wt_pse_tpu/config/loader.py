"""Three-tier configuration merge: registry defaults -> YAML overlays -> CLI leftovers.

Reproduces the reference's ``sconf.Config(*yamls, default=hparams)`` +
``argv_update(left_argv)`` behavior (``/root/reference/train.py:39-44``,
``config.yaml:1-13``) without the sconf dependency: later sources win, CLI values are
parsed as YAML scalars so ``--whitening false`` and ``--margin 0.1`` get real types.
"""

from __future__ import annotations

import yaml


class Config(dict):
    """A dict with attribute access, mirroring how the trainer reads hparams."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


def _parse_scalar(text: str):
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def argv_update(cfg: dict, left_argv: list[str]) -> dict:
    """Apply leftover CLI args (``--key value`` / ``--key=value``) onto ``cfg``.

    Dotted keys update nested dicts. Unknown keys are added (sconf semantics).
    """
    i = 0
    while i < len(left_argv):
        tok = left_argv[i]
        if not tok.startswith("--"):
            i += 1
            continue
        tok = tok[2:]
        if "=" in tok:
            key, raw = tok.split("=", 1)
            i += 1
        else:
            key = tok
            if i + 1 < len(left_argv) and not left_argv[i + 1].startswith("--"):
                raw = left_argv[i + 1]
                i += 2
            else:
                raw = "true"
                i += 1
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_scalar(raw)
    return cfg


def load_config(
    default: dict | None = None,
    yaml_paths: list[str] | None = None,
    left_argv: list[str] | None = None,
) -> Config:
    """Merge ``default`` <- each YAML in order <- CLI leftovers. Later wins."""
    cfg = Config(dict(default or {}))
    for path in yaml_paths or []:
        with open(path, encoding="utf8") as f:
            overlay = yaml.safe_load(f) or {}
        if not isinstance(overlay, dict):
            raise ValueError(f"config overlay {path} is not a mapping")
        cfg.update(overlay)
    if left_argv:
        argv_update(cfg, list(left_argv))
    return cfg
