"""Typed-ish configuration system.

Re-designs the reference's process-global ``hparams`` dict
(``/root/reference/utils/hparams.py:13-146``) as an explicit, passed-around
``Config`` object.  Capability parity:

* recursive ``base_config`` YAML inheritance with deep-first merge and
  relative-path resolution  (ref: ``utils/hparams.py:64-82``)
* merge of a previously saved ``config.yaml`` in the experiment work dir
  unless ``reset=True``                  (ref: ``utils/hparams.py:87-97``)
* ``key=value`` CLI overrides with literal type coercion
  (ref: ``utils/hparams.py:100-110``)
* flattened-config dump into the work dir (ref: ``utils/hparams.py:112-122``)

Unlike the reference there is **no global mutable state**: every component
receives the config it needs.  ``Config`` is a dict subclass with attribute
access so that the very wide key surface (docs/ConfigurationSchemas.md in the
reference) stays ergonomic without 200 dataclass fields.
"""

from __future__ import annotations

import ast
import os
from pathlib import Path
from typing import Any, Iterable, Mapping, Optional, Union

import yaml

PathLike = Union[str, os.PathLike]

# Directory holding the default configs that ship with the package.
BUILTIN_CONFIG_DIR = Path(__file__).parent / "configs"


class Config(dict):
    """A dict with attribute access and convenience helpers."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    # -- helpers -----------------------------------------------------------

    def copy(self) -> "Config":
        return Config({k: (v.copy() if isinstance(v, dict) else v) for k, v in self.items()})

    def subset(self, keys: Iterable[str]) -> "Config":
        return Config({k: self[k] for k in keys if k in self})

    def save(self, path: PathLike) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            yaml.safe_dump(_plain(self), f, sort_keys=True, allow_unicode=True)

    @staticmethod
    def from_yaml(path: PathLike) -> "Config":
        return load_config(path)


def _plain(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping) and not isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def deep_merge(base: dict, new: Mapping) -> dict:
    """Merge ``new`` into ``base`` (in place), recursing into dicts.

    Matches the reference's override semantics (``utils/hparams.py:22-27``):
    a dict value refines, any other value replaces.
    """
    for k, v in new.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, Mapping):
            deep_merge(base[k], v)
        else:
            base[k] = _plain(v) if isinstance(v, Mapping) else v
    return base


def _resolve_base(base: str, relative_to: Path) -> Path:
    """Resolve a ``base_config`` entry.

    Tries, in order: path relative to the including file's directory, path
    relative to CWD, and the package's builtin config dir (so user configs may
    say ``base_config: [acoustic.yaml]``).
    """
    cand = [relative_to / base, Path(base), BUILTIN_CONFIG_DIR / Path(base).name]
    for c in cand:
        if c.exists():
            return c
    raise FileNotFoundError(f"base_config {base!r} not found (searched {[str(c) for c in cand]})")


def _load_chain(path: Path, seen: Optional[set] = None) -> dict:
    seen = seen if seen is not None else set()
    rp = path.resolve()
    if rp in seen:
        raise ValueError(f"base_config cycle involving {path}")
    seen.add(rp)
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    bases = raw.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for b in bases:
        deep_merge(merged, _load_chain(_resolve_base(b, path.parent), seen))
    deep_merge(merged, raw)
    return merged


def coerce_value(s: str) -> Any:
    """Best-effort literal coercion for CLI ``k=v`` overrides."""
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        low = s.strip().lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("null", "none", "~"):
            return None
        return s


def parse_overrides(spec: Union[str, Mapping, None]) -> dict:
    """Parse ``"a.b=1,c=[2,3]"`` style override strings into a nested dict."""
    if not spec:
        return {}
    if isinstance(spec, Mapping):
        return dict(spec)
    out: dict = {}
    # split on commas not inside brackets
    items, depth, cur = [], 0, []
    for ch in spec:
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur))
    for item in items:
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"override {item!r} is not of the form key=value")
        k, v = item.split("=", 1)
        node = out
        parts = k.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = coerce_value(v)
    return out


def load_config(
    config_path: Optional[PathLike] = None,
    *,
    exp_name: Optional[str] = None,
    work_dir_root: PathLike = "checkpoints",
    overrides: Union[str, Mapping, None] = None,
    reset: bool = False,
    infer: bool = False,
    save: bool = False,
) -> Config:
    """Load a config the way the reference's ``set_hparams`` does.

    Precedence (lowest to highest): base_config chain < file itself <
    previously saved work-dir config (unless ``reset``) < ``overrides``.
    """
    merged: dict = {}
    if config_path is not None:
        merged = _load_chain(Path(config_path))

    work_dir = None
    if exp_name:
        work_dir = Path(work_dir_root) / exp_name
        saved = work_dir / "config.yaml"
        if saved.exists() and not reset:
            with open(saved, "r", encoding="utf-8") as f:
                saved_cfg = yaml.safe_load(f) or {}
            if config_path is None:
                merged = saved_cfg
            else:
                deep_merge(merged, saved_cfg)
        elif config_path is None:
            raise FileNotFoundError(
                f"no saved config at '{saved}' — is '{work_dir}' a trained "
                f"experiment work dir? (cwd-relative: experiments resolve "
                f"under '{Path(work_dir_root).resolve()}')"
            )
        merged["exp_name"] = exp_name
        merged["work_dir"] = str(work_dir)

    deep_merge(merged, parse_overrides(overrides))
    merged["infer"] = infer

    from .compat import migrate_legacy_keys

    migrate_legacy_keys(merged)

    cfg = _wrap(merged)
    if save and work_dir is not None:
        cfg.save(work_dir / "config.yaml")
    return cfg
