"""Asymptotic analysis tools: density evolution, decoding thresholds."""

from ldpc_tpu.analysis.density_evolution import (
    bec_erasure_fixed_point,
    bec_threshold,
    de_error_probability,
    protograph_threshold,
    regular_protograph,
)

__all__ = [
    "bec_erasure_fixed_point",
    "bec_threshold",
    "de_error_probability",
    "protograph_threshold",
    "regular_protograph",
]
