"""Normalization + shingling as Column expression builders.

Re-expresses the reference's cleaning stage (F1-F8 in SURVEY.md §2.8;
reference: Regional_Run_Files/data_processing.py:15-137, org_suffixes.py:1-30)
as pure Catalyst expressions — the reference does all of this with row-wise
pandas ``.apply`` loops; here everything is whole-stage-codegen'd JVM work.

Every builder has an exact DuckDB-dialect twin in oracle.py; keep the two in
sync (the driver's correctness gate compares value hashes).
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered longest-first, as the reference does for org suffixes.  The full
# reference dictionary (org_suffixes.py:1-30 — its space-padded variants
# collapse to one entry each under \b word-boundary matching) plus the
# inc/corp/co extensions.  'l.l.p' needs its dots escaped in the regex.
ORG_SUFFIXES = [
    ("limited liability partnership", "llp"),
    ("public limited company", "plc"),
    ("nhs foundation trust", "nft"),
    ("incorporated", "inc"),
    ("corporation", "corp"),
    ("nhs trust", "nft"),
    ("limited", "ltd"),
    ("company", "co"),
    ("nhs ft", "nft"),
    (r"l\.l\.p", "llp"),
    ("l l p", "llp"),
    ("n f t", "nft"),
]

# The short forms shorten_name strips (= the value set of ORG_SUFFIXES,
# reference org_suffixes_dict.values()).
ORG_SHORT_FORMS = ("llp", "plc", "nft", "inc", "corp", "ltd", "co")


def normalize_ws(col: Column) -> Column:
    """Lowercase, collapse runs of whitespace to one space, trim.

    Reference analogue: remvPunct's lower/strip/double-space collapse
    (data_processing.py:15-32).
    """
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def remv_punct(col: Column) -> Column:
    """Strip punctuation but keep '&', collapse whitespace, lower, trim.

    Golden value from the reference's own unit test
    (tests/test_data_processing.py:18-24):
    'Ditta ABBOTT VASCULAR Knoll-Ravizza S.p.A.'
      -> 'ditta abbott vascular knollravizza spa'
    """
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9& ]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def std_org_suffixes(col: Column) -> Column:
    """'limited'→'ltd' etc., longest pattern first (org_suffixes.py:1-30)."""
    out = col
    for long, short in ORG_SUFFIXES:
        out = F.regexp_replace(out, r"\b" + long + r"\b", short)
    return out


def shorten_name(col: Column) -> Column:
    """Strip standardized org-suffix tokens for Levenshtein scoring (F8).

    Reference shortenName (data_processing.py:121-137; golden values from
    the reference's tests/test_data_processing.py:27-33):
      'ditta abbott vascular knollravizza ltd' -> 'ditta abbott vascular knollravizza'
      'test-org plc' -> 'test org'
      'test llp org' -> 'test org'
    '-' becomes a space first, then any whole token in ORG_SHORT_FORMS is
    removed, whitespace re-collapsed.
    """
    dehyph = F.regexp_replace(col, "-", " ")
    stripped = F.regexp_replace(
        dehyph, r"\b(" + "|".join(ORG_SHORT_FORMS) + r")\b", ""
    )
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def strip_digits(col: Column) -> Column:
    """Reference data_processing.py:45-47 (remvStreetNumber-style)."""
    return F.trim(F.regexp_replace(col, r"\d+", ""))


def join_fields(*cols: Column) -> Column:
    """concat name+address parts with single spaces (data_processing.py:34-43)."""
    return F.trim(F.concat_ws(" ", *cols))


def normalize_code(col: Column) -> Column:
    """Code-adapted clean: strip line comments (#, //), block comments,
    collapse whitespace, lower.  The code analogue of the reference's
    name normalization — near-dup groups differing only in comments and
    formatting normalize to equal strings.
    """
    no_block = F.regexp_replace(col, r"(?s)/\*.*?\*/", " ")
    no_line = F.regexp_replace(no_block, r"(?m)(//|#)[^\n]*", " ")
    return normalize_ws(no_line)


def word_shingles(col: Column, k: int) -> Column:
    """Distinct k-word shingles of a normalized string → array<string>.

    Pure expressions: split → sliding window via transform(sequence(...)).
    Short texts (< k words) yield one shingle = the whole text, so no row
    ever has an empty shingle set (keeps MinHash total).
    """
    toks = F.split(col, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.array_distinct(sh)


def char_shingles(col: Column, k: int) -> Column:
    """Distinct k-char shingles → array<string> (code path)."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.substring(col, i, k))
    return F.array_distinct(sh)


def tokens(col: Column) -> Column:
    """Whitespace tokens of a normalized string (SimHash features)."""
    return F.split(col, " ")


def html_unescape_udf():
    """Vectorized pandas UDF for HTML entity unescape ('&amp;' → '&').

    Reference: .apply(html.unescape) row-wise (data_processing.py:178,241,
    SURVEY F2).  No Spark builtin exists; html.unescape over a pd.Series
    keeps it Arrow-batched.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def unescape(s: pd.Series) -> pd.Series:
        return s.map(lambda x: html.unescape(x) if x is not None else None)

    return unescape


def and_amp_variants(df, name_col: str):
    """Emit variant rows with ' and ' ↔ ' & ' swapped, union'd to the
    originals and deduped — the reference's variant-row generation
    (data_processing.py:49-80, SURVEY F4) as explode + distinct."""
    swapped = F.when(
        F.col(name_col).contains(" and "),
        F.regexp_replace(F.col(name_col), " and ", " & "),
    ).when(
        F.col(name_col).contains(" & "),
        F.regexp_replace(F.col(name_col), " & ", " and "),
    )
    variants = F.array_distinct(
        F.array(F.col(name_col), F.coalesce(swapped, F.col(name_col)))
    )
    return df.withColumn(name_col, F.explode(variants)).dropDuplicates()


def leven_ratio(a: Column, b: Column) -> Column:
    """0-100 similarity ratio from edit distance:
    floor(100 * (1 - levenshtein/greatest(len_a, len_b))).

    Reference: fuzzywuzzy fuzz.ratio scoring (data_processing.py:139-149,
    SURVEY F9) — kept as the short-string fallback metric next to Jaccard.
    Built-in levenshtein, exact twin in DuckDB (oracle.py).  floor, not
    round: the engines disagree on half-way rounding.
    """
    dist = F.levenshtein(a, b)
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return F.floor(F.lit(100) * (F.lit(1) - dist / denom)).cast("long")
