"""Mesh construction and sharded Monte-Carlo execution."""

from ldpc_tpu.parallel.mesh import make_mesh, sharded_sweep_step

__all__ = ["make_mesh", "sharded_sweep_step"]
