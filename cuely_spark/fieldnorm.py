"""Fieldnorm (doc length) quantization, numerically identical to tantivy.

The reference stores one u8 per doc per field; the token count is
quantized through a 256-entry table (reference:
crates/tantivy/src/fieldnorm/code.rs:13-270). The table is generated here
from the documented decode formula (verified against the reference's own
unit test, code.rs:301-328): ids below 24 are identity; above, a 3-bit
mantissa + shift exponential: decode(b) = 24 + ((bits|8) << (shift-1))
with bits = (b-24) & 7, shift = (b-24) >> 3 (shift==0 -> bits).

encode(token_count) = binary-search for the largest table entry <= count
(code.rs:7-11).
"""

from __future__ import annotations

import numpy as np

_IDENTITY_PART = 24


def _decode_byte(b: int) -> int:
    if b < _IDENTITY_PART:
        return b
    e = b - _IDENTITY_PART
    bits = e & 0b111
    shift = e >> 3
    if shift == 0:
        return _IDENTITY_PART + bits
    return _IDENTITY_PART + ((bits | 8) << (shift - 1))


FIELD_NORMS_TABLE: np.ndarray = np.array(
    [_decode_byte(b) for b in range(256)], dtype=np.int64
)


def fieldnorm_to_id(counts) -> np.ndarray:
    """Vectorized token-count -> u8 id (largest table value <= count)."""
    counts = np.asarray(counts, dtype=np.int64)
    # searchsorted 'right' gives index of first entry > count; -1 = floor.
    ids = np.searchsorted(FIELD_NORMS_TABLE, counts, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids) -> np.ndarray:
    """Vectorized u8 id -> decoded (quantized) token count."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.int64)]
