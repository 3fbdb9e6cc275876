"""Latency-proportional chunked-dispatch depth (round-5 small-code fix).

Each dispatch over the remote-TPU link pays ~28 ms of serialized
submission latency (examples/sublane_fill/binder.json), so the scan depth
per dispatch must scale inversely with per-batch device work -- the
round-4 perf matrix's small-code rows measured the tunnel, not the kernel
(6.7x recovered on CCSDS n32 by deepening the chunk).
"""

from __future__ import annotations

from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.runner import PointExecutor, load_code


def _executor(name, batch=4096):
    code = load_code(f"builtin:{name}")
    return PointExecutor(code, SimOptions(
        matrix=code.name, blocks=batch, iterations=12, ber=True, fer=True,
        fidelity="exact", batch=batch, seed=0, schedule="layered",
        quiet=True,
    )), code


def test_flagship_keeps_64():
    """The headline bench methodology must not change: the flagship's
    per-batch work IS the reference work, so its chunk depth stays 64."""
    ex, _ = _executor("wimax_1152_0.5.alist.txt")
    assert ex._max_chunk_steps == 64


def test_small_codes_deepen():
    ex32, _ = _executor("CCSDS_ldpc_n32_k16.alist.txt")
    assert ex32._max_chunk_steps == 4096  # capped at the 4096 ceiling
    ex384, _ = _executor("WRAN_N384_K192_P16_R05.txt")
    assert 64 < ex384._max_chunk_steps < 4096


def test_counter_headroom_cap():
    """Worst-case error_bits (k errors per frame) must fit int32."""
    for name in ("CCSDS_ldpc_n32_k16.alist.txt",
                 "wimax_2304_0.83.alist.txt"):
        ex, code = _executor(name)
        assert (ex._max_chunk_steps * code.k * ex.batch) < (1 << 31)


def test_large_batch_shrinks_depth():
    ex, _ = _executor("CCSDS_ldpc_n32_k16.alist.txt", batch=65536)
    ex2, _ = _executor("CCSDS_ldpc_n32_k16.alist.txt", batch=4096)
    assert ex._max_chunk_steps <= ex2._max_chunk_steps
