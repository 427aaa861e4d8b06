"""Million-keyword state-sharded (TP-analog) scan — the >HBM regime.

``TableShardedScanner`` exists for dictionaries whose packed table exceeds
per-chip HBM; this pins its behavior at the same 4.36M-state dictionary the
single-chip 1M tests use (``SetTest.java:82-89`` scaled to the config-5
regime): the ~490 MB count-packed table is row-sharded over the 8-device
CPU mesh, and the hotstate extraction must produce window-exact triples and
a pinned count.

Runtime ~60-90 s (native compile ~11 s + one mesh scan of a 64Ki window).
"""

import numpy as np

from ahocorasick_tpu.models.matchers import AhoCorasickSet
from ahocorasick_tpu.parallel import sharding

from test_full_random_1m import N_KEYWORDS, N_STATES, _keywords

# Pinned facts for rng seed 77, window [300000, 300000 + 64Ki) of the 1Mi
# text (regenerate only with an algorithm change).
WINDOW_MATCHES = 80_030


def test_full_random_1m_table_sharded():
    kws, rng, letters = _keywords()
    assert len(kws) == N_KEYWORDS

    m = AhoCorasickSet(kws, engine="device")
    assert m.compiled.num_states == N_STATES

    from ahocorasick_tpu.ops import scan_batched

    assert scan_batched.hotstate_layout(m.compiled)

    n_units = 1 << 20
    body = letters[rng.integers(0, 26, size=n_units)].tobytes().decode()
    text = list(body)
    pos = rng.integers(0, n_units - 16, size=2000)
    kw_pick = rng.integers(0, len(kws), size=2000)
    for p, k in zip(pos, kw_pick):
        w = kws[k]
        text[p : p + len(w)] = w
    text = "".join(text)[:n_units]

    w0 = 300_000
    window = text[w0 : w0 + (1 << 16)]

    ts = sharding.TableShardedScanner(m, sharding.model_mesh())
    assert ts.layout == "hotstate"
    s, e, v = ts.match_triples(window)
    assert len(s) == WINDOW_MATCHES

    # Window-exact triples vs the single-chip device engine (itself oracle-
    # verified in test_full_random_1m).
    s1, e1, v1 = m.match_triples(window)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e1))
    assert ts.count(window) == WINDOW_MATCHES
