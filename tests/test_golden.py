"""Checked-in golden conformance fixtures: every engine, byte-for-byte.

The fixtures (tests/golden/fixtures.json) pin exact (start, end, value_id)
triples in the reference's emission order (SURVEY.md §1 conventions; end is
one past the last unit).  A diff here is a semantic regression — regenerate
via tests/golden/generate.py only for an intentional semantics change, and
say why in the commit.
"""

import json
import os

import pytest

from ahocorasick_tpu.models.matchers import _CLASS_BY_KIND

_PATH = os.path.join(os.path.dirname(__file__), "golden", "fixtures.json")
with open(_PATH) as f:
    FIXTURES = json.load(f)


def _run(case, engine):
    cls = _CLASS_BY_KIND[(case["kind"], case["map"])]
    if case["map"]:
        m = cls(case["keywords"], list(range(len(case["keywords"]))),
                case["case_sensitive"], engine=engine)
    else:
        m = cls(case["keywords"], case["case_sensitive"], engine=engine)
    s, e, v = m.match_triples(case["haystack"])
    return [[int(a), int(b), int(c)] for a, b, c in zip(s, e, v)]


@pytest.mark.parametrize("case", FIXTURES, ids=[c["name"] for c in FIXTURES])
@pytest.mark.parametrize("engine", ["gold", "device"])
def test_golden(case, engine):
    assert _run(case, engine) == case["triples"]


@pytest.mark.parametrize("case", [c for c in FIXTURES if not c["map"]][:4],
                         ids=lambda c: c["name"])
def test_golden_stream_mode(case):
    """Stream mode (chunked) reproduces the same triples with positions."""
    cls = _CLASS_BY_KIND[(case["kind"], False)]
    m = cls(case["keywords"], case["case_sensitive"])
    h = case["haystack"]
    got = m.match_stream(iter([h[:7], h[7:19], h[19:]]))
    assert got == [(a, b) for a, b, _ in case["triples"]]
