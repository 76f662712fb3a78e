"""The test-tier list stays honest: every ``slow_tests.txt`` entry must
still name a real test (a rename would otherwise silently drop a sweep
back into the fast tier — or worse, out of `-m slow` coverage)."""

import os
import re


def test_slow_entries_resolve():
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "slow_tests.txt")) as f:
        entries = [
            line.split("#", 1)[0].strip()
            for line in f
            if line.split("#", 1)[0].strip()
        ]
    assert entries, "slow tier list is empty"
    root = os.path.dirname(here)
    for entry in entries:
        path, _, name = entry.partition("::")
        full = os.path.join(root, path)
        assert os.path.isfile(full), f"missing file for {entry}"
        with open(full) as f:
            text = f.read()
        assert re.search(rf"^def {re.escape(name)}\b", text, re.M), (
            f"no test function for {entry}"
        )


def test_slow_entries_unique():
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "slow_tests.txt")) as f:
        entries = [
            line.split("#", 1)[0].strip()
            for line in f
            if line.split("#", 1)[0].strip()
        ]
    assert len(entries) == len(set(entries))
