"""Batched device compute: encode, channel, interleave, decode, metrics."""

from ldpc_tpu.ops.encode import make_encoder
from ldpc_tpu.ops.channel import ChannelParams, make_channel
from ldpc_tpu.ops.interleave import make_interleaver
from ldpc_tpu.ops.spa import DecodeResult, make_decoder

__all__ = [
    "make_encoder",
    "ChannelParams",
    "make_channel",
    "make_interleaver",
    "DecodeResult",
    "make_decoder",
]
