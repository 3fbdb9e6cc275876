"""Worker process for the multi-controller test (tests/test_distributed.py).

Not a test module. Launched as:
    python distributed_worker.py <pid> <nproc> <port> <out.json>

Each worker owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device runtime, and the sharded Monte-Carlo step runs with the batch
axis spanning both processes (cross-process psum over Gloo).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    from ldpc_tpu.parallel.distributed import (
        initialize_distributed,
        is_multi_process,
    )

    started = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    import jax

    assert started and is_multi_process(), "multi-controller init failed"
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

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

    json.dump(
        {
            "process_id": pid,
            "devices": jax.device_count(),
            "blocks": stats.blocks,
            "ok_blocks": stats.ok_blocks,
            "error_bits": stats.error_bits,
            "fer_frames": stats.fer_frames,
            "norm_llr_sum": stats.norm_llr_sum,
            "conv_iters_sum": stats.conv_iters_sum,
            "conv_count": stats.conv_count,
        },
        open(out, "w"),
    )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
