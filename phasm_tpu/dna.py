"""DNA encoding utilities: 2-bit base codes and reverse complements.

Bases are encoded A=0, C=1, G=2, T=3 so that reverse complement is the pure
integer map ``c -> 3 - c``.  All sequence tensors in the framework carry these
codes as ``uint8`` (one base per byte for compute; see :func:`pack_2bit` for
the 4-bases-per-byte storage format that mirrors DAZZ_DB's read database).

Reference: phasm represents sequences as Python strings/bytes
(phasm/io/sequences.py); the TPU rebuild uses flat integer tensors so that
alignment kernels and graph passes are vectorizable.
"""
from __future__ import annotations

import numpy as np

BASES = "ACGT"
PAD = 255  # sentinel code for padding; never equal to any base or its RC

_ENCODE_LUT = np.full(256, 0, dtype=np.uint8)
for _i, _b in enumerate(BASES):
    _ENCODE_LUT[ord(_b)] = _i
    _ENCODE_LUT[ord(_b.lower())] = _i

_DECODE_LUT = np.array([ord(b) for b in BASES] + [ord("N")] * 252, dtype=np.uint8)


def encode(seq: str | bytes) -> np.ndarray:
    """Encode an ASCII DNA string into uint8 base codes (A=0,C=1,G=2,T=3).

    Ambiguous characters (N etc.) map to A=0, matching the common assembler
    convention of arbitrary-but-deterministic resolution.
    """
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENCODE_LUT[raw]


def decode(codes: np.ndarray) -> str:
    """Decode uint8 base codes back to an ASCII string (PAD -> 'N')."""
    return _DECODE_LUT[np.asarray(codes, dtype=np.uint8)].tobytes().decode("ascii")


def revcomp(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code vector: reverse order, complement 3-c.

    PAD values complement to an out-of-range value and are clamped back to
    PAD, so padded tails stay padded.
    """
    out = (3 - codes[::-1].astype(np.int16)).astype(np.uint8)
    out[codes[::-1] == PAD] = PAD
    return out


def pack_2bit(codes: np.ndarray) -> np.ndarray:
    """Pack base codes (values 0..3) four-per-byte, little-endian within byte.

    Mirrors the DAZZ_DB on-disk representation (reference stage 0 uses
    fasta2DB's 2-bit packed database).  Length must be padded to a multiple
    of 4 by the caller; PAD bytes must be masked to 0 first.
    """
    c = np.asarray(codes, dtype=np.uint8)
    assert c.shape[-1] % 4 == 0, "pack_2bit needs length % 4 == 0"
    c = c.reshape(c.shape[:-1] + (-1, 4)) & 0x3
    return (c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4) | (c[..., 3] << 6)).astype(
        np.uint8
    )


def unpack_2bit(packed: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_2bit`."""
    p = np.asarray(packed, dtype=np.uint8)
    out = np.empty(p.shape[:-1] + (p.shape[-1] * 4,), dtype=np.uint8)
    out[..., 0::4] = p & 0x3
    out[..., 1::4] = (p >> 2) & 0x3
    out[..., 2::4] = (p >> 4) & 0x3
    out[..., 3::4] = (p >> 6) & 0x3
    return out
