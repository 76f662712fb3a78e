"""Docs integrity: the API reference's names must resolve.

The reference gates its docs through a readthedocs build
(reference: .readthedocs.yaml); this package's docs are plain markdown,
so the equivalent check is that every module documented in
``docs/api.md`` imports and every bullet's leading identifier exists on
it — stale docs fail CI instead of rotting.
"""

import importlib
import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "docs")

_HEADER = re.compile(r"^## `([\w.]+)`")
_BULLET_NAME = re.compile(r"^- (?:\w[\w /]*: )?`([A-Za-z_][\w.]*)`")


def _api_entries():
    entries = []
    module = None
    with open(os.path.join(DOCS, "api.md")) as f:
        for line in f:
            m = _HEADER.match(line)
            if m:
                module = m.group(1)
                entries.append((module, None))
                continue
            m = _BULLET_NAME.match(line)
            if m and module is not None:
                entries.append((module, m.group(1)))
    assert entries, "docs/api.md has no parseable API entries"
    return entries


@pytest.mark.parametrize(
    "module,name",
    _api_entries(),
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_api_reference_resolves(module, name):
    try:
        mod = importlib.import_module(module)
    except ImportError as e:
        pytest.skip(f"optional dependency missing for {module}: {e}")
    if name is None:
        return
    target = mod
    for part in name.split("."):
        assert hasattr(target, part), (
            f"docs/api.md documents {module}.{name} but it does not exist"
        )
        target = getattr(target, part)


def test_docs_files_exist():
    for fname in (
        "overview.md",
        "api.md",
        "config.md",
        "tutorial.md",
        "migration.md",
        "kaldi-pipeline.md",
        "training.md",
    ):
        assert os.path.exists(os.path.join(DOCS, fname)), fname


def test_docs_internal_links_resolve():
    """Relative markdown links inside docs/ must point at real files."""
    link = re.compile(r"\]\((?!https?://|#)([^)#]+)")
    for fname in os.listdir(DOCS):
        if not fname.endswith(".md"):
            continue
        with open(os.path.join(DOCS, fname)) as f:
            text = f.read()
        for target in link.findall(text):
            path = os.path.normpath(os.path.join(DOCS, target))
            assert os.path.exists(path), f"{fname} links to missing {target}"
