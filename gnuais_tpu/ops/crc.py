"""Batched CRC-16/X.25 on device.

The host CRC drain (golden.model.crc_check_and_extract) is authoritative
and cheap at real frame rates; this device kernel exists for the
fully-on-device pipeline variant, where frames are CRC-filtered before
any host readback (useful at extreme stream counts: only passing frames
travel back).

Byte-table algorithm over the packed line-order bytes, expressed as a
scan over byte positions vectorized over [frames] — identical
accept/reject behavior to protodec_calculate_crc (protodec.c:120-167),
including the whole-byte truncation of the payload and the 0x0f47
residue check.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnuais_tpu import constants as C
from gnuais_tpu.ops.demod import REG_BITS, REG_WORDS

_CRC_TABLE = jnp.asarray(C.CRC_TABLE.astype(np.int32))


def frames_to_line_bits(words: jax.Array, total_bits: jax.Array) -> jax.Array:
    """Unpack register snapshots to line-order bit matrices.

    words: [F, REG_WORDS] uint32 (newest appended bit = LSB of last
    word); total_bits: [F] int32 = payload+22.  Returns bits [F,
    REG_BITS] int32 where column 0 is each frame's FIRST appended bit
    (frames shorter than REG_BITS are left-aligned, zero padded).
    """
    f = words.shape[0]
    # bit j of the register (0 = oldest retained) lives at
    # word j//32, bit (31 - j%32)
    j = jnp.arange(REG_BITS)
    w = j // 32
    sh = 31 - (j % 32)
    reg_bits = ((words[:, w] >> sh.astype(jnp.uint32)) & 1).astype(jnp.int32)
    # frame occupies the last total_bits register positions; shift each
    # row left so the frame starts at column 0
    start = (REG_BITS - total_bits)[:, None]
    idx = jnp.clip(start + j[None, :], 0, REG_BITS - 1)
    out = jnp.take_along_axis(reg_bits, idx, axis=1)
    # zero out positions beyond the frame length
    out = jnp.where(j[None, :] < total_bits[:, None], out, 0)
    return out


def crc_check_frames(words: jax.Array, payload_len: jax.Array) -> jax.Array:
    """Vectorized accept mask for frame snapshots.

    words: [F, REG_WORDS] uint32; payload_len: [F] int32 (bufferpos-22).
    Returns bool [F]: True iff CRC residue matches.
    """
    total_bits = payload_len + C.FRAME_TAIL_BITS
    bits = frames_to_line_bits(words, total_bits)           # [F, 480]
    # pack LSB-first bytes: byte k = bits[8k..8k+8) with bit i weight 2^i
    nbytes_max = REG_BITS // 8
    b = bits.reshape(-1, nbytes_max, 8)
    weights = (1 << jnp.arange(8)).astype(jnp.int32)
    data = jnp.sum(b * weights[None, None, :], axis=2)      # [F, 60]

    # CRC over length_bytes+2 bytes where length_bytes = payload//8
    buflen = payload_len // 8 + 2                           # [F]

    def step(crc, xk):
        data_k, k = xk
        active = k < buflen
        nxt = (crc >> 8) ^ _CRC_TABLE[(crc ^ data_k) & 0xFF]
        return jnp.where(active, nxt, crc), None

    crc0 = jnp.full((words.shape[0],), C.CRC_INIT, dtype=jnp.int32)
    crc, _ = jax.lax.scan(
        step, crc0, (data.T, jnp.arange(nbytes_max)))
    ok = ((~crc) & 0xFFFF) == C.CRC_MAGIC_RESIDUE
    return ok & (payload_len > 0)


def extract_payload_bits(words: jax.Array, payload_len: jax.Array) -> jax.Array:
    """Device-side payload extraction: MSB-first AIS order [F, 456]
    (whole bytes only, like rbuffer re-expansion protodec.c:150-162)."""
    total_bits = payload_len + C.FRAME_TAIL_BITS
    bits = frames_to_line_bits(words, total_bits)
    nbytes_max = REG_BITS // 8
    b = bits.reshape(-1, nbytes_max, 8)
    msb = b[:, :, ::-1].reshape(-1, REG_BITS)   # per-byte bit reversal
    nbytes = payload_len // 8
    j = jnp.arange(REG_BITS)
    return jnp.where(j[None, :] < nbytes[:, None] * 8, msb, 0)
