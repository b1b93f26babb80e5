"""Arrow-batched numpy kernels — the scale path for the hash stages.

Each kernel is the numeric twin of an expression builder in hashing.py and
MUST produce bit-identical output (tests/test_kernels_parity.py enforces
this).  The split of labor: string→int hashing stays JVM-side (md5 via
Catalyst, whole-stage codegen), and the O(num_perm × shingles) integer
arithmetic runs here as vectorized numpy over Arrow batches — the pattern
the input_hint mandates ("vectorized pandas/Arrow UDFs, no per-row Python").

Reference analogue: none — the reference's heavy kernel is dedupe.io's
blocking/scoring (Regional_Run_Files/data_matching.py:173-192), opaque and
row-wise; this is its from-scratch replacement (north_rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from ..config import MERSENNE31, CascadeConfig


def make_minhash_udf(cfg: CascadeConfig):
    """pandas UDF: array<long> shingle-hashes → array<long> MinHash signature.

    Per row: sig = min((a[:,None] * x[None,:] + b[:,None]) % P, axis=1).
    a,x < P = 2^31-1 so the product stays < 2^62 — exact in int64, identical
    to the expression form and to the DuckDB oracle.
    """
    a, b = cfg.perms  # int64 arrays, shape (num_perm,)
    # Two-level blocking keeps the working set CACHE-resident, not just
    # RAM-resident:
    # - sub-batch ~16k hash elements per flush (flat fits L1/L2);
    # - the permutation loop runs in blocks of PERM_BLOCK rows, so the
    #   (PERM_BLOCK × sub_elems) work matrix is ~1.5 MB — private-L2 scale.
    # The old single-pass (num_perm × sub_elems) matrix was ~16 MB per
    # worker; 8 workers × 16 MB thrashes the shared L3 and was measured as
    # the minhash stage scaling only 1.8x from local[2] to local[8] while
    # the pure-JVM stages scaled 4.0x.
    PERM_BLOCK = 16
    sub_elems = max(1, 2_000_000 // max(int(a.shape[0]), 1))

    @pandas_udf("array<bigint>")
    def minhash(hashes: pd.Series) -> pd.Series:
        out = [None] * len(hashes)
        nperm = a.shape[0]
        group_rows: list[int] = []
        group_arrs: list[np.ndarray] = []
        group_total = 0

        def flush() -> None:
            nonlocal group_rows, group_arrs, group_total
            if not group_rows:
                return
            flat = np.concatenate(group_arrs)
            lens = np.fromiter((x.shape[0] for x in group_arrs), dtype=np.int64)
            offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
            sigs = np.empty((nperm, len(group_rows)), dtype=np.int64)
            for p0 in range(0, nperm, PERM_BLOCK):
                p1 = min(p0 + PERM_BLOCK, nperm)
                y = a[p0:p1, None] * flat[None, :]
                y += b[p0:p1, None]
                # Mersenne-prime reduction: y mod (2^31-1) via two
                # shift-folds — identical result to %, ~3x faster than
                # integer division
                y = (y & MERSENNE31) + (y >> 31)
                y = (y & MERSENNE31) + (y >> 31)
                y[y >= MERSENNE31] -= MERSENNE31
                sigs[p0:p1] = np.minimum.reduceat(y, offsets, axis=1)
            for j, i in enumerate(group_rows):
                out[i] = sigs[:, j]
            group_rows, group_arrs, group_total = [], [], 0

        for i, xs in enumerate(hashes):
            if xs is None or len(xs) == 0:
                continue
            arr = np.asarray(xs, dtype=np.int64)
            group_rows.append(i)
            group_arrs.append(arr)
            group_total += arr.shape[0]
            if group_total >= sub_elems:
                flush()
        flush()
        return pd.Series(out)

    return minhash


def make_simhash_udf(cfg: CascadeConfig):
    """pandas UDF: array<long> token-hashes → long SimHash (60 bits).

    bit_j = 1 iff sum over tokens of (2*bit_j(h)-1) >= 0; multiplicity
    counts.  Vectorized: unpack bits of all token hashes of a row at once.
    """
    nbits = cfg.simhash_bits
    shifts = np.arange(nbits, dtype=np.int64)
    # bit-identical twin of simhash_expr (hashing.py): empty array → every
    # vote sum is 0 ≥ 0 → all bits set; null array → null.  Parity enforced
    # by tests/test_kernels_parity.py including the empty/null rows.
    empty_val = (1 << nbits) - 1

    @pandas_udf("bigint")
    def simhash(hashes: pd.Series) -> pd.Series:
        # batch-level vectorization: unpack all token hashes at once,
        # add.reduceat sums votes per row
        lens = np.fromiter(
            (0 if xs is None else len(xs) for xs in hashes), dtype=np.int64,
            count=len(hashes),
        )
        flat = np.concatenate(
            [np.asarray(xs, dtype=np.int64) for xs in hashes if xs is not None and len(xs)]
            or [np.empty(0, dtype=np.int64)]
        )
        out: list[int | None] = [
            None if xs is None else empty_val for xs in hashes
        ]
        if flat.shape[0]:
            bits = ((flat[:, None] >> shifts[None, :]) & 1).astype(np.int64)
            signed = 2 * bits - 1                               # (total, nbits)
            nz = lens > 0
            offsets = np.concatenate(([0], np.cumsum(lens[nz])))[:-1]
            votes = np.add.reduceat(signed, offsets, axis=0)    # (n_nonzero, nbits)
            sims = ((votes >= 0).astype(np.int64) << shifts[None, :]).sum(axis=1)
            for j, i in enumerate(np.flatnonzero(nz)):
                out[i] = int(sims[j])
        return pd.Series(out, dtype="object")

    return simhash


def make_winnow_udf(cfg: CascadeConfig):
    """pandas UDF: array<long> k-gram hashes → array<long> winnowing prints.

    Sliding-window minimum via a monotonic deque — O(m) per document instead
    of the O(m*w) of the expression form; same output (set of window minima,
    distinct, order of first appearance).
    """
    w = cfg.winnow_w

    @pandas_udf("array<bigint>")
    def winnow(grams: pd.Series) -> pd.Series:
        out = []
        for xs in grams:
            if xs is None or len(xs) == 0:
                out.append(None)
                continue
            x = np.asarray(xs, dtype=np.int64)
            m = len(x)
            if m <= w:
                out.append(np.array([x.min()], dtype=np.int64))
                continue
            mins = np.lib.stride_tricks.sliding_window_view(x, w).min(axis=1)
            seen: dict[int, None] = {}
            for v in mins:
                if v not in seen:
                    seen[v] = None
            out.append(np.fromiter(seen.keys(), dtype=np.int64))
        return pd.Series(out)

    return winnow


def make_winnow_pos_udf(cfg: CascadeConfig):
    """pandas UDF: array<long> k-gram hashes → array<struct<fp,pos>> —
    winnowing prints WITH the char offset of each selected k-gram (gram j
    starts at char j: fast_kgram_hashes slides one char at a time).

    Positions are what make MOSS-style anchored verification possible: for
    any substring of length >= w+k-1 shared by two documents, every window
    of w grams fully inside the shared region sees the same gram sequence
    in both documents, so argmin picks the same gram at the same RELATIVE
    offset — both sides emit an (fp, pos) anchor pair that is ALIGNED
    inside the shared region.  Char-wise extension from that anchor then
    recovers the exact maximal common substring (operators/suffix.py).
    """
    w = cfg.winnow_w

    @pandas_udf("array<struct<fp: bigint, pos: int>>")
    def winnow_pos(grams: pd.Series) -> pd.Series:
        out = []
        for xs in grams:
            if xs is None or len(xs) == 0:
                out.append(None)
                continue
            x = np.asarray(xs, dtype=np.int64)
            m = len(x)
            if m <= w:
                p = int(x.argmin())
                out.append([{"fp": int(x[p]), "pos": p}])
                continue
            # argmin per window (first-min tie-break: deterministic and
            # content-local, which is all the alignment guarantee needs),
            # dedup'd by selected gram index
            rel = np.lib.stride_tricks.sliding_window_view(x, w).argmin(axis=1)
            pos = np.unique(rel + np.arange(m - w + 1))
            out.append([{"fp": int(x[p]), "pos": int(p)} for p in pos])
        return pd.Series(out)

    return winnow_pos


def apply_minhash(hashes_col: Column, cfg: CascadeConfig) -> Column:
    return make_minhash_udf(cfg)(hashes_col)


def apply_simhash(tok_hashes_col: Column, cfg: CascadeConfig) -> Column:
    return make_simhash_udf(cfg)(tok_hashes_col)
