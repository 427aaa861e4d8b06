"""Microbenchmark CLI — the TPU replacement for the reference's per-test
``main()`` perf loops and ``bin/test-branches`` A/B harness.

    python -m ahocorasick_tpu.bench --kind ac --keywords 10000 --units 1048576

Prints one JSON line per run with ScanStats fields; diff two git branches by
running this in each and comparing (the ``bin/test-branches`` workflow).
"""
