"""The docs site builds (tools/build_docs.py) — the repo's equivalent of
the reference's sphinx/readthedocs gate (reference: .readthedocs.yaml,
docs/source/).  One command renders every markdown page plus a
per-module API reference from live docstrings; a failed render or a
module that no longer imports fails the build (and this test)."""

import os
import sys

import pytest


def test_docs_site_builds(tmp_path):
    pytest.importorskip("markdown_it")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import build_docs
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "site")
    assert build_docs.main(["--out", out]) == 0

    # every docs/*.md page rendered
    docs = os.path.join(os.path.dirname(__file__), "..", "docs")
    for fname in os.listdir(docs):
        if fname.endswith(".md"):
            page = os.path.join(out, fname[:-3] + ".html")
            assert os.path.isfile(page), page
    assert os.path.isfile(os.path.join(out, "index.html"))
    assert os.path.isfile(os.path.join(out, "changelog.html"))

    # API reference: every listed module got a page with real content
    api = os.path.join(out, "api")
    pages = os.listdir(api)
    assert len(pages) == len(build_docs._DOC_MODULES) + 1  # + index
    with open(os.path.join(api, "speech_tpu_compute.html")) as f:
        compute = f.read()
    assert "STFTFrameComputer" in compute and 'class="docstring"' in compute
    with open(os.path.join(api, "speech_tpu_serve.html")) as f:
        serve = f.read()
    assert "FeatureServer" in serve

    # .md cross-links rewritten to the rendered pages
    with open(os.path.join(out, "overview.html")) as f:
        overview = f.read()
    assert '.md"' not in overview
