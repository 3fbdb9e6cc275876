"""Host-side orchestration: configs, results, SNR sweeps, adaptive control."""

from ldpc_tpu.sim.config import SimOptions
from ldpc_tpu.sim.results import (
    BlockResult,
    SimulationConfig,
    SimulationResult,
    SNRPointResult,
)
from ldpc_tpu.sim.runner import run_simulation

__all__ = [
    "SimOptions",
    "BlockResult",
    "SimulationConfig",
    "SimulationResult",
    "SNRPointResult",
    "run_simulation",
]
