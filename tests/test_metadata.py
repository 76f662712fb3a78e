"""Package metadata (reference: tests/test_metadata.py — version sanity)."""

import pathlib
import re

import pytest

import speech_tpu


def test_version():
    assert re.fullmatch(r"\d+\.\d+\.\d+([ab.]\w+)?", speech_tpu.__version__)


def test_version_single_sourced():
    # pyproject derives the version dynamically from the package attr;
    # only meaningful from a source checkout (an installed wheel has no
    # pyproject.toml next to the package — metadata is the authority there)
    path = pathlib.Path(speech_tpu.__file__).parents[1] / "pyproject.toml"
    if not path.is_file():
        pytest.skip("no source checkout (installed package)")
    text = path.read_text()
    assert re.search(r'^dynamic = \["version"\]', text, re.M)
    assert 'attr = "speech_tpu.__version__"' in text


def test_changelog_mentions_current_version():
    path = pathlib.Path(speech_tpu.__file__).parents[1] / "CHANGELOG.md"
    if not path.is_file():
        pytest.skip("no source checkout (installed package)")
    assert speech_tpu.__version__ in path.read_text()
