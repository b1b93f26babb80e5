"""Shared configuration — the single source of truth for every hash constant.

The same (prime, a_i, b_i) parameters drive three implementations that must
agree bit-for-bit:

1. Spark SQL expressions (functions/hashing.py) — JVM side, codegen'd;
2. numpy kernels inside Arrow-batched pandas UDFs (functions/kernels.py);
3. the DuckDB oracle SQL generator (oracle.py) used by the driver's
   correctness gate.

The cross-engine string→int64 primitive is
``CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)`` (Spark) ==
``('0x' || substr(md5(s),1,15))::BIGINT`` (DuckDB): 15 hex chars < 2^60 so it
fits signed int64 in both engines.  MinHash permutations are
``(a*x + b) % P`` with ``P = 2^31 - 1`` so ``a*x < 2^62`` never overflows
signed 64-bit arithmetic in either engine.

Reference analogue: the reference delegates blocking+scoring to dedupe.io
with config files (/root/reference/Config_Files/1_config.py); here the
"config as data" idea survives as this dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Mersenne prime 2^31 - 1: large enough for MinHash collision resistance,
# small enough that (a * x + b) stays under 2^62 in signed 64-bit math.
MERSENNE31 = 2_147_483_647

# Upper bound of the md5-15-hex-chars primitive (16^15 = 2^60).
MD5_60BIT_MAX = 1 << 60


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic MinHash permutation parameters a_i ∈ [1,P), b_i ∈ [0,P).

    RandomState (legacy) is used deliberately: its output stream is frozen by
    numpy's backwards-compatibility policy, so signatures are stable across
    numpy versions.
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_perm).astype(np.int64)
    b = rng.randint(0, MERSENNE31, size=num_perm).astype(np.int64)
    return a, b


@dataclass(frozen=True)
class CascadeConfig:
    """Geometry of the dedup pipeline.

    Defaults give LSH collision probability 1-(1-s^r)^b ≈ 0.9998 at
    Jaccard s = 0.8 with r = 4, b = 16 — comfortably above the ≥ 0.99
    dup-pair recall bar at the verification threshold.
    """

    # --- shingling ---
    shingle_mode: str = "word"  # "word" (documents) or "char" (code)
    shingle_k: int = 3          # n-gram width (words or chars)
    char_shingle_k: int = 9     # width when shingle_mode == "char"

    # --- MinHash / LSH ---
    num_perm: int = 64
    lsh_bands: int = 16
    lsh_rows: int = 4           # num_perm == lsh_bands * lsh_rows
    jaccard_threshold: float = 0.8
    hash_seed: int = 42

    # --- SimHash (short-file path) ---
    # 60 bits: the md5-15-hex primitive is 60-bit, so every bit of the token
    # hash is deterministic and cross-engine reproducible.
    simhash_bits: int = 60
    simhash_chunks: int = 4     # pigeonhole: hamming<=chunks-1 ⇒ one chunk equal
    simhash_max_hamming: int = 3
    short_doc_max_tokens: int = 64   # docs at/below this go through SimHash

    # --- winnowing / long-substring (suffix-array stand-in) path ---
    winnow_k: int = 32          # char k-gram width for fingerprints
    winnow_w: int = 48          # window: any shared substring of length
                                # >= winnow_k + winnow_w - 1 shares a print
    min_common_substring: int = 79  # = winnow_k + winnow_w - 1

    # --- skew control ---
    max_bucket_size: int = 200  # LSH buckets larger than this are capped
                                # (salted subsample) — skew guard for 100 TB
    cap_salts: int = 16         # salt fan-out for the bucket-cap window: a
                                # degenerate bucket is split across this many
                                # window partitions before capping, so no
                                # single task ever sorts the whole bucket
    shuffle_partitions: int = 32

    def __post_init__(self) -> None:
        if self.num_perm != self.lsh_bands * self.lsh_rows:
            raise ValueError("num_perm must equal lsh_bands * lsh_rows")

    @property
    def perms(self) -> tuple[np.ndarray, np.ndarray]:
        return perm_params(self.num_perm, self.hash_seed)

    @property
    def perm_pairs(self) -> list[tuple[int, int]]:
        """(a_i, b_i) as plain ints — consumed by the SQL generators."""
        a, b = self.perms
        return [(int(x), int(y)) for x, y in zip(a, b)]


DEFAULT_CONFIG = CascadeConfig()

# Code near-dup preset.  Identifier renames in otherwise-identical files
# push char-9-gram Jaccard down to ~0.6 (a single rename rewrites every
# shingle spanning the identifier), so the verify threshold is 0.55.  LSH
# geometry r=4, b=33: collision prob 1-(1-s^r)^b = 0.997 at the planted
# minimum s≈0.64 (recall bar 0.99 holds) while background pairs at s=0.1
# collide at only 0.33% — r=2 geometries hit ~1 at s=0.55 but turn the
# candidate set quadratic (measured: 4% of ALL pairs at 1000 files).
# Candidate volume scales as n² * E[1-(1-J^r)^b] over the background
# Jaccard distribution — r is the lever that keeps it near-linear.
# Winnow geometry for code: 48-char grams / 64-hash windows (guarantee:
# any shared verbatim block >= 111 chars is caught).  32-char grams collide
# on common code idioms and flood the LCS verifier; 48-char grams are
# specific enough that candidates ≈ true block pairs.
CODE_CONFIG = CascadeConfig(
    shingle_mode="char",
    num_perm=132,
    lsh_bands=33,
    lsh_rows=4,
    jaccard_threshold=0.55,
    winnow_k=48,
    winnow_w=64,
    min_common_substring=111,
)
