"""Cascading quality filter + per-config stats + best-config selection.

Reference analogues:
- MatchFiltering.filter: per-band (char_count range, min_match_score)
  threshold filter, 8 staged passes over one file
  (Regional_Run_Files/match_filtering.py:18-84, config bands e.g.
  Config_Files/1_config.py).  Re-expressed as a SINGLE pass: a when-chain
  assigns each row its band, one filter applies the band's threshold —
  semantically identical output, one scan instead of eight (SURVEY §4).
- StatsCalculations.calculate_internals (data_analysis.py:23-64): counts,
  conditional counts, averages, ratios → one aggregate.
- VerificationAndUploads best-config argmax (match_filtering.py:173-175)
  → max_by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (char_count_lo, char_count_hi, min_score] bands, reference-shaped
# (Config_Files/1_config.py:20-100 uses dicts {char_counts, min_match_score}).
DEFAULT_BANDS: list[tuple[int, int, float]] = [
    (0, 20, 0.95),
    (20, 50, 0.90),
    (50, 200, 0.85),
    (200, 1 << 31, 0.80),
]


def band_expr(length_col: Column, bands: list[tuple[int, int, float]]) -> Column:
    """Band index for a length — when-chain, single pass."""
    expr = F.lit(-1)
    for i, (lo, hi, _score) in enumerate(bands):
        expr = F.when((length_col > lo) & (length_col <= hi), F.lit(i)).otherwise(expr)
    return expr


def threshold_expr(length_col: Column, bands: list[tuple[int, int, float]]) -> Column:
    expr = F.lit(None).cast("double")
    for lo, hi, score in bands:
        expr = F.when((length_col > lo) & (length_col <= hi), F.lit(score)).otherwise(expr)
    return expr


def cascade_filter(
    df: DataFrame,
    length_col: str,
    score_col: str,
    bands: list[tuple[int, int, float]] | None = None,
    keep: bool = True,
) -> DataFrame:
    """Keep rows whose score clears their length-band's threshold.

    keep=False returns the complement (the reference's
    getExcludedandNonMatches, match_filtering.py:87-147, SURVEY P5).
    """
    bands = bands or DEFAULT_BANDS
    lcol = F.col(length_col)
    passed = F.col(score_col) >= threshold_expr(lcol, bands)
    out = df.withColumn("band", band_expr(lcol, bands))
    return out.filter(passed if keep else ~F.coalesce(passed, F.lit(False)))


def match_stats(
    df: DataFrame, score_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group match statistics in one aggregate (SURVEY A5-A7)."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(score_col)).alias("n_scored"),
        F.round(F.avg(score_col), 4).alias("avg_score"),
        F.round(F.min(score_col), 4).alias("min_score"),
        F.round(F.max(score_col), 4).alias("max_score"),
        F.sum(F.when(F.col(score_col) >= 0.9, 1).otherwise(0)).alias("n_high"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def best_config(stats: DataFrame, config_col: str, metric_col: str) -> DataFrame:
    """argmax over per-config stats (SURVEY A9) — max_by, one reduce."""
    return stats.agg(F.max_by(F.col(config_col), F.col(metric_col)).alias("best_config"))


def parse_band_config(conf: dict, default_name: str = "config") -> tuple[str, list]:
    """Reference-shaped config dict → (name, bands).

    Mirrors Config_Files/1_config.py's per-band dicts:
    {"name": ..., "bands": [{"char_counts": [lo, hi],
    "min_match_score": s}, ...]} — the same (length range, score threshold)
    cascade the reference sweeps per run (runfile.py:190-243)."""
    bands = [
        (int(b["char_counts"][0]), int(b["char_counts"][1]),
         float(b["min_match_score"]))
        for b in conf["bands"]
    ]
    return str(conf.get("name", default_name)), bands


def sweep_band_configs(
    edges: DataFrame,
    docs: DataFrame,
    id_col: str,
    length_col,
    configs: list[tuple[str, list[tuple[int, int, float]]]],
    score_col: str = "jaccard",
    metric: str = "avg_score",
) -> tuple[DataFrame, DataFrame]:
    """The reference's OUTERMOST loop (runfile.py:190-243 →
    match_filtering.py:158-191): run the cascade band filter + match stats
    for EVERY config over the same verified edges, emit the per-config
    stats table and the argmax winner.

    One materialization of the length-joined edge set feeds all N filters
    (each filter+aggregate is a metadata-light pass over the persisted
    frame — the reference re-read its matches file per config).  Banding is
    on the PAIR length = the shorter side's document length, the analogue
    of the reference's char_count of the matched name.

    Returns (stats, best): stats has one row per config
    (config, n_rows, n_scored, avg_score, min_score, max_score, n_high);
    best is the 1-row argmax of `metric`.
    """
    lens = docs.select(F.col(id_col).alias("_lid"), length_col.alias("_len"))
    e = (
        edges.join(
            lens.select(F.col("_lid").alias("id_a"), F.col("_len").alias("_len_a")),
            "id_a",
        )
        .join(
            lens.select(F.col("_lid").alias("id_b"), F.col("_len").alias("_len_b")),
            "id_b",
        )
        .withColumn("pair_len", F.least("_len_a", "_len_b"))
        .persist()
    )
    stats = None
    for name, bands in configs:
        kept = cascade_filter(e, "pair_len", score_col, bands)
        st = match_stats(kept, score_col).withColumn("config", F.lit(name))
        stats = st if stats is None else stats.unionByName(st)
    best = best_config(stats.filter(F.col("n_scored") > 0), "config", metric)
    return stats, best
