"""A/B: WWL scan-walk kernel — plane-sweep vs fused die-sweep-in-carry.

VERDICT r4 weak-point 1: the 0.46 GB/s baseline-4 figure was attributed to
plane output + compaction by cost decomposition, not ablation.  This probe
measures both kernels on the real chip at the baseline-4 config (1000-kw
word-uniform dictionary, custom word chars) with the bench harness's
device-resident-reps methodology, so docs/PERF.md can carry a measured A/B
and ``scan_wwl.FUSED_DEFAULT`` is set by data.

Run (TPU, one process at a time):  timeout 1500 python tools/probes/probe_wwl_fused.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from ahocorasick_tpu.bench import wwl_kernel_rate
from ahocorasick_tpu.bench.__main__ import english_like_keywords, word_soup
from ahocorasick_tpu.models.matchers import WholeWordLongestMatchSet
from ahocorasick_tpu.ops import scan_wwl
from ahocorasick_tpu.utils import chartables


def main():
    rng = np.random.default_rng(0)
    wc = chartables.default_word_chars().copy()
    wc[ord("'")] = True
    kws = english_like_keywords(rng, 1000) + ["naïve", "can't", "übermäßig"]
    text = word_soup(rng, kws, 1 << 20) + " can't naïve übermäßig can'tx"
    m = WholeWordLongestMatchSet(kws, True, word_chars=wc, engine="device")
    assert scan_wwl.scan_applicable(m.compiled)
    cls = m._classes(text)
    d = scan_wwl.bucket_depth(m.compiled.max_depth)
    sc_host = scan_wwl.build_wwl_scan(m.compiled)
    print(json.dumps({"probe": "wwl_fused_ab", "config": "baseline-4",
                      "d": d, "id_bits": sc_host.id_bits,
                      "fused_applicable": scan_wwl.fused_applicable(sc_host, d)}),
          flush=True)

    for mode in ("sweep", "fused"):
        scan_wwl.FUSED_DEFAULT = mode == "fused"
        gbps = wwl_kernel_rate(m, cls, reps=8)
        print(json.dumps({"mode": mode, "kernel_gbps": round(gbps, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
