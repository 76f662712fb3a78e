"""Package metadata (reference: tests/test_metadata.py — version sanity)."""

import re

import speech_tpu


def test_version():
    assert re.fullmatch(r"\d+\.\d+\.\d+([ab.]\w+)?", speech_tpu.__version__)


def test_version_matches_pyproject():
    import pathlib

    text = (
        pathlib.Path(speech_tpu.__file__).parents[1] / "pyproject.toml"
    ).read_text()
    m = re.search(r'^version = "([^"]+)"', text, re.M)
    assert m and m.group(1) == speech_tpu.__version__
