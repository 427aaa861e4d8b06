"""Multi-host launch glue (parallel/launch.py) on the CPU-simulated mesh.

True multi-process behavior needs a pod; what IS testable here: the
single-process degenerate path produces exactly the arrays the sharded
kernels expect, initialize() is a safe no-op, and the offset arithmetic
holds.
"""

import numpy as np
import pytest

from ahocorasick_tpu import AhoCorasickSet
from ahocorasick_tpu.parallel import launch, sharding


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert launch.initialize() is False
    assert launch.initialize() is False  # idempotent


def test_global_mesh_covers_all_devices():
    import jax

    mesh = launch.global_data_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8


def test_prepare_process_local_feeds_sharded_counter():
    rng = np.random.default_rng(5)
    kws = ["ab", "bca", "cc"]
    m = AhoCorasickSet(kws, engine="device")
    text = "".join(rng.choice(list("abc "), size=9000))
    cls = m._classes(text)

    mesh = launch.global_data_mesh()
    prepare, count, _ = sharding.make_sharded_counter(m, mesh)
    want = int(count(prepare(cls)))

    local_units = 512 * 8 * 3  # chunk x devices x 3
    arr, offset = launch.prepare_process_local(cls, mesh, local_units)
    assert offset == 0
    assert arr.shape == (local_units,)
    assert int(count(arr)) == want == len(m.match(text))


def test_prepare_process_local_validates():
    m = AhoCorasickSet(["ab"], engine="device")
    mesh = launch.global_data_mesh()
    with pytest.raises(ValueError, match="multiple"):
        launch.prepare_process_local(np.zeros(10, np.int32), mesh, 1000)
    with pytest.raises(ValueError, match="longer"):
        launch.prepare_process_local(
            np.zeros(513 * 8 * 512, np.int32), mesh, 512 * 8
        )
