"""Deterministic hashing kernels for dedup / fingerprinting.

All vectorized numpy; no Python-per-row in hot paths. Hash functions are
fixed-constant splitmix64 / FNV-1a variants so results are identical
across processes, nodes and Python versions (PYTHONHASHSEED-independent
— ``hash()`` is never used).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x ^= x >> np.uint64(30)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x ^= x >> np.uint64(27)
        x = (x * np.uint64(0x94D049BB133111EB)) & _MASK64
        x ^= x >> np.uint64(31)
    return x


def md5_hex(texts) -> list[str]:
    """md5 hex digest per string (exact-dedup key; SQL-oracle-friendly:
    DuckDB's md5() matches byte-for-byte on UTF-8 input)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hash per token: pandas' vectorized string hash
    (fixed-key siphash — C speed, PYTHONHASHSEED-independent,
    identical across processes), splitmix64-mixed."""
    import pandas as pd

    if not tokens:
        return np.empty(0, np.uint64)
    h = pd.util.hash_pandas_object(
        pd.Series(tokens, dtype="object"), index=False).to_numpy()
    return splitmix64(h.astype(np.uint64))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (k consecutive whitespace tokens)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(token_hashes(shingles)) if shingles else np.empty(0, np.uint64)


# MinHash: h_i(x) = splitmix64(x ^ seed_i); signature = min over shingles.
def minhash_signature(sh: np.ndarray, num_perm: int, seeds: np.ndarray) -> np.ndarray:
    if len(sh) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_shingles) xor then mix then min — vectorized
    mixed = splitmix64(sh[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def make_seeds(num_perm: int, seed: int = 42) -> np.ndarray:
    base = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        return splitmix64(np.arange(num_perm, dtype=np.uint64) + base)


def md5_token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hash per token from the first 8 md5 bytes —
    slower than :func:`token_hashes` but exactly reproducible in SQL
    (DuckDB: ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``), which is
    what lets the simhash family carry a DuckDB oracle."""
    if not tokens:
        return np.empty(0, np.uint64)
    return np.array([int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                     for t in tokens], dtype=np.uint64)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over md5-based token hashes (unweighted;
    md5 so the whole simhash pipeline is SQL-oracle-reproducible)."""
    if not tokens:
        return 0
    hs = md5_token_hashes(tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in np.nonzero(v > 0)[0]:
        out |= np.uint64(1) << np.uint64(b)
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hamming distance (SWAR popcount — no Python
    per element)."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = ((x & np.uint64(0x3333333333333333))
             + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return x.astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (len(a) + len(b) - inter)


# --- HyperLogLog (mergeable distinct-count sketch) --------------------------

HLL_P = 14  # 2^14 registers → ~0.8% relative error


def hll_init(p: int = HLL_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hs: np.ndarray, p: int = HLL_P) -> None:
    """Fold 64-bit hashes into the register array in place — fully
    vectorized (bucket = low p bits; rank = leading-zero count of the
    remaining bits + 1, via log2 on the shifted value)."""
    if not len(hs):
        return
    hs = hs.astype(np.uint64)
    bucket = (hs & np.uint64((1 << p) - 1)).astype(np.int64)
    w = hs >> np.uint64(p)
    nbits = 64 - p
    # rank = nbits - floor(log2(w)) for w > 0, else nbits + 1
    wl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    wl[nz] = np.frexp(w[nz].astype(np.float64))[1] - 1  # floor(log2)
    rank = np.where(nz, nbits - wl, nbits + 1).astype(np.uint8)
    np.maximum.at(reg, bucket, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(reg: np.ndarray, p: int = HLL_P) -> float:
    """Standard HLL estimate with the small-range (linear counting)
    correction — adequate for engine-side cardinality planning; exact
    counts remain the oracle's job."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
