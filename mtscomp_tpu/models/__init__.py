"""Entropy models: symbol statistics and coding tables for the rANS codec."""

from .rans import (  # noqa: F401
    SCALE_BITS, SCALE, RANS_L, quantize_freqs, zigzag_encode, zigzag_decode,
    rans_encode_interleaved, rans_decode_interleaved,
)
