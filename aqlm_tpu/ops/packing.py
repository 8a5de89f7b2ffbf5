"""Code packing utilities and HF-checkpoint code-layout conversion.

The reference stores codes in the smallest *signed* torch dtype and restores
unsigned semantics with ``% 2**nbits``
(/root/reference/inference_lib/src/aqlm/utils.py:11-41). JAX has native
unsigned ints, so our canonical in-memory layout is simply uint8/uint16.
These helpers convert between the HF-AQLM on-disk layout (signed torch ints)
and ours, plus sub-byte bit-packing for the 1-bit-style schemes.
"""

from __future__ import annotations

import numpy as np

from aqlm_tpu.config import AqlmScheme

__all__ = ["unpack_hf_codes", "pack_hf_codes", "pack_bits", "unpack_bits"]


def unpack_hf_codes(codes: np.ndarray, scheme: AqlmScheme) -> np.ndarray:
    """Signed torch-style code storage -> canonical unsigned codes.

    HF AQLM checkpoints store codes as int8/int16/int32 with negative values
    wrapping (cf. utils.py:34-41 ``unpack_int_data``: ``data % 2**nbits``).
    """
    return np.asarray(
        np.asarray(codes).astype(np.int64) % scheme.codebook_size
    ).astype(scheme.code_dtype)


def pack_hf_codes(codes: np.ndarray, scheme: AqlmScheme) -> np.ndarray:
    """Canonical unsigned codes -> signed storage as HF checkpoints expect."""
    nbits = scheme.nbits_per_codebook
    if nbits <= 8:
        signed = np.int8
    elif nbits <= 16:
        signed = np.int16
    else:
        signed = np.int32
    return np.asarray(codes).astype(np.int64).astype(signed)


def pack_bits(codes: np.ndarray, nbits: int) -> np.ndarray:
    """Pack an array of small unsigned ints into a flat uint8 bitstream.

    Used for minimal on-disk footprint of sub-byte schemes; in-device layout
    stays uint8 (TPU vector units have no sub-byte int support worth using
    for gather indices).
    """
    flat = np.asarray(codes).astype(np.uint64).ravel()
    if np.any(flat >= (1 << nbits)):
        raise ValueError(f"code out of range for nbits={nbits}")
    total_bits = flat.size * nbits
    out = np.zeros((total_bits + 7) // 8, dtype=np.uint8)
    bitpos = np.arange(flat.size, dtype=np.uint64) * nbits
    for b in range(nbits):
        bit = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.uint8)
        pos = bitpos + np.uint64(b)
        np.bitwise_or.at(out, (pos // 8).astype(np.int64), bit << (pos % 8).astype(np.uint8))
    return out


def unpack_bits(packed: np.ndarray, nbits: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns ``count`` codes as uint16."""
    packed = np.asarray(packed, dtype=np.uint8)
    out = np.zeros(count, dtype=np.uint16)
    bitpos = np.arange(count, dtype=np.uint64) * nbits
    for b in range(nbits):
        pos = bitpos + np.uint64(b)
        bit = (packed[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1
        out |= bit.astype(np.uint16) << np.uint16(b)
    return out
