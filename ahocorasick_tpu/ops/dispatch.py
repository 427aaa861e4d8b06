"""One engine dispatcher for the AC-family device scan paths.

``pick_engine`` (ops/scan_rowdfa) chooses the fastest applicable engine;
this module turns that choice into a concrete *plan* — the device tables to
pass through jit/shard_map boundaries, the chunker halo, and a kernel
closure over plain ``chunk_classes``-layout windows.  It exists so the four
former hand-rolled copies of the engine switch (matcher emit-planes path,
fused device count, bench kernel-rate harness, sharded counter) cannot
drift: adding an engine or changing a halo convention happens here once.

Window contract: every ``fn(tables, windows)`` takes ``int32[B, halo + C]``
windows as built by ``scan_batched.chunk_classes(cls, chunk, plan.halo)``
(left halo warmup, PAD_CLASS padding).  The block engine's lane regrouping
happens in-jit (a reshape/transpose — one cheap HBM pass), so callers never
special-case the window layout.  ``chunk`` must be even (the stride-2
engine pairs characters; 512 everywhere).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple


class EnginePlan(NamedTuple):
    which: str  # block | rowdfa2 | rowdfa1 | batched | split | packedcount | hotstate
    halo: int  # left-halo length for chunk_classes
    tables: Tuple  # device (jnp) arrays; pass back as fn(tables, windows)
    fn: Callable  # fn(tables, windows) -> int32 count | uint32[P, N] planes


def _regroup_in_jit(windows):
    """(B, W) windows -> ((G*W*8, 128) lane-major, W, G) for the block
    kernel; mirrors ``kernels.scan_block.regroup_windows`` (host numpy)
    exactly, with PAD_CLASS(=0) lanes padding B up to G*1024."""
    import jax.numpy as jnp

    B, W = windows.shape
    G = -(-B // 1024)
    if G * 1024 != B:
        pad = jnp.zeros((G * 1024 - B, W), windows.dtype)  # PAD_CLASS == 0
        windows = jnp.concatenate([windows, pad], axis=0)
    wt = windows.reshape(G, 8, 128, W).transpose(0, 3, 1, 2)
    return wt.reshape(G * W * 8, 128), W, G


def count_plan(compiled, dev, allow_block: bool = True,
               force_batched: bool = False) -> EnginePlan:
    """Plan for the fused COUNT kernels (popcount summed on device).

    ``force_batched`` skips the row/block engines — the matchers'
    ``device_engine="batched"`` cross-check knob, mirrored from
    ``planes_plan`` so the knob governs BOTH scan paths."""
    from ahocorasick_tpu.ops import scan_batched, scan_rowdfa

    A = compiled.num_classes
    which = ("batched" if force_batched
             else scan_rowdfa.pick_engine(compiled, allow_block=allow_block))
    if which == "block":
        from ahocorasick_tpu.kernels import scan_block

        bd = dev.block_dfa

        def fn(tables, windows):
            # Narrow (uint8/uint16) lanes feed Pallas directly: the kernel
            # widens per-block (blk.astype), measured +5% over an up-front
            # astype pass and exact on TPU + interpret mode.
            wt, W, G = _regroup_in_jit(windows)
            return scan_block.block_count(
                tables[0], wt, bd.halo, bd.state_bits, bd.num_classes,
                bd.num_blocks, W, G)

        return EnginePlan("block", bd.halo, (bd.table,), fn)
    if which == "rowdfa2":
        rd = dev.row_dfa
        fn = lambda tables, w: scan_rowdfa.rowdfa_count(
            tables[0], w, rd.halo, rd.state_bits, rd.num_classes)
        return EnginePlan("rowdfa2", rd.halo, (rd.table,), fn)
    if which == "rowdfa1":
        rd = dev.row_dfa1
        fn = lambda tables, w: scan_rowdfa.rowdfa1_count(
            tables[0], w, rd.halo, rd.state_bits, rd.num_classes)
        return EnginePlan("rowdfa1", rd.halo, (rd.table,), fn)
    if not scan_batched.inline_packable(compiled):
        if scan_batched.count_packable(compiled):
            # One gather per character: the emit COUNT rides the packed
            # entry even when the per-length mask cannot.
            flat, cp_bits, halo = dev.count_packed_dfa
            fn = lambda tables, w: scan_batched.packedcount_count(
                tables[0], w, halo, cp_bits, A)
            return EnginePlan("packedcount", halo, (flat,), fn)
        return _split_plan(compiled, dev, scan_batched.split_count)
    pd = dev.packed_dfa
    fn = lambda tables, w: scan_batched.batched_count(
        tables[0], w, pd.halo, pd.state_bits)
    return EnginePlan("batched", pd.halo, (pd.table,), fn)


def planes_plan(compiled, dev, allow_block: bool = True,
                force_batched: bool = False) -> EnginePlan:
    # NOTE: keyword-argument order matches count_plan exactly so the twin
    # switches cannot be positionally confused.
    """Plan for the END-indexed emit-plane kernels (``uint32[P, N]`` bits).

    ``force_batched`` skips the row/block engines (the matchers'
    ``device_engine="batched"`` cross-check knob); ``allow_block=False``
    only excludes the Pallas block kernel (see ``pick_engine``)."""
    from ahocorasick_tpu.ops import scan_batched, scan_rowdfa

    which = ("batched" if force_batched
             else scan_rowdfa.pick_engine(compiled, allow_block=allow_block))
    if which == "block":
        from ahocorasick_tpu.kernels import scan_block

        bd = dev.block_dfa

        def fn(tables, windows):
            # Narrow lanes straight into Pallas (see count_plan block fn).
            wt, W, G = _regroup_in_jit(windows)
            # Padded lanes (B rounded to G*1024 windows) trail the text;
            # the extractor trims to the text length.
            return scan_block.block_emit_planes(
                tables[0], wt, bd.halo, bd.state_bits, bd.num_classes,
                bd.num_blocks, W, G)

        return EnginePlan("block", bd.halo, (bd.table,), fn)
    if which == "rowdfa2":
        rd = dev.row_dfa
        fn = lambda tables, w: scan_rowdfa.rowdfa_emit_planes(
            tables[0], w, rd.halo, rd.state_bits, rd.num_classes, 1)
        return EnginePlan("rowdfa2", rd.halo, (rd.table,), fn)
    if which == "rowdfa1":
        rd = dev.row_dfa1
        fn = lambda tables, w: scan_rowdfa.rowdfa1_emit_planes(
            tables[0], w, rd.halo, rd.state_bits, rd.num_classes)
        return EnginePlan("rowdfa1", rd.halo, (rd.table,), fn)
    if not scan_batched.inline_packable(compiled):
        if scan_batched.hotstate_layout(compiled):
            # Huge dictionary, count-packable: ONE gather per character;
            # output is the packed (state, count) plane, decoded host-side
            # by the same predicate (scan_batched.hotstate_layout).
            flat, cp_bits, halo = dev.count_packed_dfa
            A = compiled.num_classes
            fn = lambda tables, w: scan_batched.packedcount_hotstate_plane(
                tables[0], w, halo, cp_bits, A)
            return EnginePlan("hotstate", halo, (flat,), fn)
        # Packed layout overflows and counts don't fit either:
        # split path — one next-state gather + P emit gathers per char.
        return _split_plan(compiled, dev, scan_batched.split_emit_planes)
    pd = dev.packed_dfa
    fn = lambda tables, w: scan_batched.batched_emit_planes(
        tables[0], w, pd.halo, pd.state_bits, 1)
    return EnginePlan("batched", pd.halo, (pd.table,), fn)


def _split_plan(compiled, dev, kernel) -> EnginePlan:
    dfa_flat, emit_tab, halo = dev.split_dfa
    planes = (max(compiled.max_depth, 1) + 31) // 32
    fn = lambda tables, w: kernel(
        tables[0], tables[1], w, halo, compiled.num_classes, planes)
    return EnginePlan("split", halo, (dfa_flat, emit_tab), fn)
