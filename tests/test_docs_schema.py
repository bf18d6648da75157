"""Docs/config consistency: every config key the code reads (or any packaged
YAML sets) must be documented in docs/ConfigurationSchemas.md.

The reference documents its whole surface in an 88 KB schema file
(ref: docs/ConfigurationSchemas.md); this test keeps ours honest as the
config surface grows.
"""

import re
from pathlib import Path

import yaml

ROOT = Path(__file__).parent.parent
PKG = ROOT / "xiaoicesing_io_tpu"
DOC = ROOT / "docs" / "ConfigurationSchemas.md"

# keys that are internal plumbing, never user-set
INTERNAL = {
    "infer",  # set by the CLI --infer flag, mirrors the reference's hparams['infer']
}

_READ_PAT = re.compile(
    r"""(?:cfg|config|hparams|self\.cfg|self\.config)\s*(?:\.get\(\s*|\[)\s*["']([A-Za-z0-9_]+)["']"""
)


def _keys_read_in_code():
    keys = set()
    for f in PKG.rglob("*.py"):
        for m in _READ_PAT.finditer(f.read_text()):
            keys.add(m.group(1))
    return keys


def _keys_in_packaged_yaml():
    keys = set()
    for f in (PKG / "configs").rglob("*.yaml"):
        d = yaml.safe_load(f.read_text())
        if isinstance(d, dict):
            keys |= set(d.keys())
    return keys


def _documented_keys():
    """Expand the doc's compact spellings: `a / b` alternatives,
    `prefix_{x,y}` brace sets, and `*_suffix` globs."""
    text = DOC.read_text()
    words = set(re.findall(r"[A-Za-z0-9_*]+", text))
    braces = re.findall(r"([A-Za-z0-9_]*)\{([A-Za-z0-9_,]+)\}([A-Za-z0-9_]*)", text)
    for pre, alts, post in braces:
        for alt in alts.split(","):
            words.add(f"{pre}{alt}{post}")
    globs = [w for w in words if "*" in w]
    return words, globs


def test_all_config_keys_documented():
    documented, globs = _documented_keys()
    missing = []
    for key in sorted(_keys_read_in_code() | _keys_in_packaged_yaml()):
        if key in INTERNAL or key in documented:
            continue
        if any(re.fullmatch(g.replace("*", r"[A-Za-z0-9_]+"), key) for g in globs):
            continue
        missing.append(key)
    assert not missing, (
        f"config keys undocumented in docs/ConfigurationSchemas.md: {missing}"
    )


def _nested_yaml_keys():
    """All dotted key paths set by any packaged config."""
    def walk(d, pre=""):
        for k, v in d.items():
            yield f"{pre}{k}"
            if isinstance(v, dict):
                yield from walk(v, f"{pre}{k}.")

    keys = set()
    for f in (PKG / "configs").rglob("*.yaml"):
        d = yaml.safe_load(f.read_text())
        if isinstance(d, dict):
            keys |= set(walk(d))
    return keys


def test_every_key_has_its_own_entry():
    """Per-key schema depth (the reference documents each key, including
    nested args, as its own entry with type/default/scope attributes —
    ref docs/ConfigurationSchemas.md): every dotted key path any packaged
    YAML sets must have a `### <key>` heading, and every entry must carry
    the full attribute line."""
    text = DOC.read_text()
    headings = set(re.findall(r"^### ([A-Za-z0-9_.]+)$", text, re.M))
    missing = sorted(k for k in _nested_yaml_keys() if k not in headings)
    assert not missing, f"keys without their own schema entry: {missing}"

    # each heading's body must state type, default, visibility, scope and
    # customizability
    blocks = re.split(r"^### ", text, flags=re.M)[1:]
    incomplete = []
    for b in blocks:
        name = b.split("\n", 1)[0].strip()
        for attr in ("type:", "default:", "visibility:", "scope:",
                     "customizability:"):
            if attr not in b:
                incomplete.append((name, attr))
    assert not incomplete, f"entries missing attributes: {incomplete}"
