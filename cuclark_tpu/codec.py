"""2-bit nucleotide codec and canonical k-mer extraction.

Encoding parity with the reference (CLARK/Jellyfish convention,
src/kmersConversion.cc:49-68): A=3, C=2, G=1, T=0, case-insensitive;
any other character (N, IUPAC codes, ...) breaks the read into separate
"parts" — k-mers never span it (src/CuCLARK_hh.hh:1679-1698).

Reverse complement is the Jellyfish bit swizzle
(src/kmersConversion.cc:39-47), done here on uint32 halves: a 32-bit
base-order reversal per half, half swap, bitwise complement, then a
static right shift — all dense VPU ops, vectorized over every window
position of every read at once.

K-mer packing avoids the reference's sequential rolling loop
(src/CuCLARK_hh.hh:1149-1163): a log-doubling combine builds all
window values in O(log k) shifted-OR passes over the whole batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cuclark_tpu import u64

# Sentinel code for non-ACGT characters / padding.
INVALID = 4

# Host lookup table: ASCII byte -> 2-bit code (A=3 C=2 G=1 T=0), INVALID
# else; RNA 'U' maps to T like the reference's nucleotide tables
# (src/CuCLARK_hh.hh:287,295).
BASE_LUT = np.full(256, INVALID, dtype=np.uint8)
for _ch, _code in (("A", 3), ("C", 2), ("G", 1), ("T", 0), ("U", 0)):
    BASE_LUT[ord(_ch)] = _code
    BASE_LUT[ord(_ch.lower())] = _code

_CODE_TO_BASE = {3: "A", 2: "C", 1: "G", 0: "T"}


def encode_ascii(buf: bytes | np.ndarray) -> np.ndarray:
    """ASCII sequence bytes -> uint8 codes (0..3, INVALID for non-ACGT)."""
    arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else np.asarray(buf, dtype=np.uint8)
    return BASE_LUT[arr]


def kmer_to_string(kmer: int, k: int) -> str:
    """Integer k-mer -> base string (debug/tests)."""
    return "".join(_CODE_TO_BASE[(int(kmer) >> (2 * (k - 1 - i))) & 3] for i in range(k))


def string_to_kmer(s: str) -> int:
    """Base string -> integer k-mer (reference getKmers semantics)."""
    v = 0
    for ch in s:
        c = BASE_LUT[ord(ch)]
        if c == INVALID:
            raise ValueError(f"invalid base {ch!r}")
        v = (v << 2) | int(c)
    return v


def revcomp_np(kmer: np.ndarray, k: int) -> np.ndarray:
    """Reference getReverse (src/kmersConversion.cc:39-47) on numpy uint64."""
    x = np.asarray(kmer, dtype=np.uint64)
    m = np.uint64
    x = ((x >> m(2)) & m(0x3333333333333333)) | ((x & m(0x3333333333333333)) << m(2))
    x = ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F)) | ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4))
    x = ((x >> m(8)) & m(0x00FF00FF00FF00FF)) | ((x & m(0x00FF00FF00FF00FF)) << m(8))
    x = ((x >> m(16)) & m(0x0000FFFF0000FFFF)) | ((x & m(0x0000FFFF0000FFFF)) << m(16))
    x = (x >> m(32)) | (x << m(32))
    return (~x) >> m(64 - 2 * k)


def canonical_np(kmer: np.ndarray, k: int) -> np.ndarray:
    """min(forward, revcomp) — reference addElement canonicalization
    (src/HashTableStorage_hh.hh:484-497)."""
    return np.minimum(np.asarray(kmer, dtype=np.uint64), revcomp_np(kmer, k))


def _rev32(x):
    """Reverse the 16 2-bit bases within each uint32 lane."""
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = (x >> 16) | (x << 16)
    return x.astype(jnp.uint32)

def revcomp(pair, k: int):
    """Vectorized Jellyfish reverse complement on a (hi, lo) pair."""
    hi, lo = pair
    # Reverse base order across 64 bits: reverse each half, swap halves.
    rhi, rlo = _rev32(lo), _rev32(hi)
    # Complement every base (A=3 <-> T=0, C=2 <-> G=1 under this code).
    rhi, rlo = ~rhi, ~rlo
    # Right-align to 2k bits.
    return u64.shr((rhi.astype(jnp.uint32), rlo.astype(jnp.uint32)), 64 - 2 * k)


def canonical(pair, k: int):
    """min(forward, revcomp) on (hi, lo) pairs."""
    return u64.min_(pair, revcomp(pair, k))


def pack_codes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack a uint8 code matrix [R, L] (values 0..3 or INVALID) into the
    wire format shipped host->device:

      packed2: uint8 [R, Lp/4]  — 4 bases/byte, little-endian 2-bit
      vbits:   uint8 [R, Lp/8]  — validity bitmask, little-endian

    where Lp = L rounded up to a multiple of 8 (pad positions pack as
    INVALID, i.e. valid bit 0), so the unpacked length is always
    recoverable from the shapes alone (Lp = 4*packed2.shape[-1]).

    The reference ships reads to the GPU as 4-nt/byte containers for the
    same reason (src/CuCLARK_hh.hh:1630-1716): interconnect bytes are the
    scarce resource.  INVALID positions pack an arbitrary 2-bit value and
    a 0 valid bit; unpack_codes restores INVALID exactly.
    """
    codes = np.asarray(codes, dtype=np.uint8)
    R, L = codes.shape
    Lp = -(-L // 8) * 8
    if Lp != L:
        pad = np.full((R, Lp - L), INVALID, np.uint8)
        codes = np.concatenate([codes, pad], axis=1)
    c2 = (codes & 3).reshape(R, -1, 4)
    packed2 = (c2[:, :, 0] | (c2[:, :, 1] << 2) | (c2[:, :, 2] << 4)
               | (c2[:, :, 3] << 6)).astype(np.uint8)
    vbits = np.packbits(codes < INVALID, axis=1, bitorder="little")
    return packed2, vbits


def unpack_codes(packed2, vbits, L: int | None = None):
    """Device-side inverse of pack_codes -> int32 codes [R, L].

    L defaults to the full padded length 4*packed2.shape[-1]; padding
    positions unpack to INVALID, so downstream k-mer windows over them
    are masked out exactly like host-side INVALID padding."""
    if L is None:
        L = 4 * packed2.shape[-1]
    p = packed2.astype(jnp.int32)                       # [R, L/4]
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    c = (p[:, :, None] >> shifts[None, None, :]) & 3    # [R, L/4, 4]
    c = c.reshape(p.shape[0], -1)[:, :L]
    v = vbits.astype(jnp.int32)                         # [R, L/8]
    bits = jnp.arange(8, dtype=jnp.int32)
    val = (v[:, :, None] >> bits[None, None, :]) & 1    # [R, L/8, 8]
    val = val.reshape(v.shape[0], -1)[:, :L]
    return jnp.where(val == 1, c, INVALID)


def _shift_left_positions(x, n: int):
    """x[..., p] -> x[..., p + n], zero-padded at the tail."""
    if n == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n)]
    return jnp.pad(x[..., n:], pad)


def extract_kmers(codes, k: int):
    """All k-mer windows of a batch of encoded reads.

    codes: int32/uint8 [..., L] with values 0..3 or INVALID (padding & Ns).
    Returns ((hi, lo), valid): uint32 pairs [..., P] and bool [..., P],
    P = L - k + 1.  valid[p] is True iff the window [p, p+k) contains no
    INVALID code — the reference's "part" semantics (k-mers never span
    an N; sub-k parts contribute nothing, src/CuCLARK_hh.hh:1679-1698).
    """
    codes = codes.astype(jnp.int32)
    L = codes.shape[-1]
    if L < k:
        raise ValueError(f"padded read length {L} < k={k}")
    P = L - k + 1

    invalid = (codes >= INVALID).astype(jnp.int32)
    cs = jnp.cumsum(invalid, axis=-1)
    pad = [(0, 0)] * (codes.ndim - 1) + [(1, 0)]
    cs = jnp.pad(cs, pad)  # exclusive prefix counts, [..., L+1]
    valid = (cs[..., k:] - cs[..., :-k]) == 0  # [..., P]

    # Log-doubling pack: S_j[p] = 2-bit pack of codes[p : p + 2^j].
    masked = jnp.where(codes < INVALID, codes, 0).astype(jnp.uint32)
    s = u64.from_lo(masked)
    packs = {1: s}
    w = 1
    while w * 2 <= k:
        shifted = (
            _shift_left_positions(s[0], w),
            _shift_left_positions(s[1], w),
        )
        s = u64.or_(u64.shl(s, 2 * w), shifted)
        w *= 2
        packs[w] = s

    # Compose k as a sum of powers of two, widest first.
    result = None
    pos = 0
    rem = k
    for w in sorted(packs, reverse=True):
        while rem >= w:
            piece = packs[w]
            piece = (
                _shift_left_positions(piece[0], pos),
                _shift_left_positions(piece[1], pos),
            )
            result = piece if result is None else u64.or_(u64.shl(result, 2 * w), piece)
            pos += w
            rem -= w
    hi, lo = result
    return (hi[..., :P], lo[..., :P]), valid
