"""Asymptotic analysis tools: density evolution, decoding thresholds."""

from ldpc_tpu.analysis.density_evolution import (
    de_error_probability,
    protograph_threshold,
    regular_protograph,
)

__all__ = [
    "de_error_probability",
    "protograph_threshold",
    "regular_protograph",
]
