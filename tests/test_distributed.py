"""Real multi-process jax.distributed test (SURVEY.md S4 commitment).

Two OS processes, each with 4 virtual CPU devices, join one 8-device
multi-controller runtime (coordinator + Gloo collectives) and run the
mesh-sharded Monte-Carlo step with the batch axis spanning both processes.
Counters must agree between the processes (replicated psum result) AND match
a single-process 8-device run of the identical configuration -- threefry
partitionability makes the randomness independent of the process layout.

The reference's only parallelism is single-host ProcessPoolExecutor fan-out
(`python_ldpc_app/main.py:241-292`); this is the DCN-capable analogue.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_sweep(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # Workers import ldpc_tpu by path, not via an installed package. The
    # repo path REPLACES any inherited PYTHONPATH: a TPU-plugin site dir on
    # it (sitecustomize) would initialize JAX at interpreter startup --
    # before the worker can point it at the virtual-CPU platform.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    a, b = (json.load(open(o)) for o in outs)
    assert a["devices"] == b["devices"] == 8
    for key in ("blocks", "ok_blocks", "error_bits", "fer_frames",
                "conv_iters_sum", "conv_count"):
        assert a[key] == b[key], key

    # single-process ground truth on the in-process 8-device CPU backend
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the single-process check")
    from ldpc_tpu.parallel.mesh import make_mesh
    from ldpc_tpu.sim.config import SimOptions
    from ldpc_tpu.sim.runner import PointExecutor, load_code

    code = load_code("builtin:CCSDS_ldpc_n32_k16.alist.txt")
    opts = SimOptions(
        matrix=code.name, blocks=64, iterations=5, ber=True, fer=True,
        normalized_llr=True, fidelity="exact", batch=64, seed=7, quiet=True,
    )
    ex = PointExecutor(code, opts, mesh=make_mesh({"batch": -1}))
    stats = ex.run_point(1.0, 64, jax.random.key(7), 0)
    assert (a["blocks"], a["ok_blocks"], a["error_bits"], a["fer_frames"]) \
        == (stats.blocks, stats.ok_blocks, stats.error_bits, stats.fer_frames)
    assert abs(a["norm_llr_sum"] - stats.norm_llr_sum) < 1e-4
