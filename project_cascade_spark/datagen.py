"""Deterministic synthetic `code_files` table with planted near-dup groups.

The BASELINE.json input_hint fixes the input shape:
    code_files(repo string, path string, commit string, lang string,
               content string)
No external data is allowed in this sandbox, so tests and benchmarks run on
this seeded generator.  Ground truth comes back as a second table keyed by
(repo, path, commit):

- kind='near'   : groups of 2-5 files derived from one base by bounded edits
                  (whitespace/comments/renames/small inserts) — must end up
                  in one cluster (dup-pair recall >= 0.99 target).
- kind='short'  : groups of very short files with 1-2 token edits — the
                  SimHash path must catch these.
- kind='block'  : pairs of otherwise-unrelated files sharing one long
                  verbatim block — the suffix/winnowing path must catch
                  these (they are NOT near-dups and must NOT merge clusters
                  at the Jaccard threshold).
- kind='exact'  : byte-identical copies — the sha256 exact-dedup path.
- kind='uniq'   : background singletons.

Stable row identity for the pipeline: file_id = xxhash64(repo, path, commit)
(the table has no id column by design; see sources/tables.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_IDENTS = [
    "total", "index", "buffer", "result", "count", "value", "offset", "cursor",
    "payload", "segment", "window", "bucket", "shard", "record", "stream",
    "handle", "token", "cache", "queue", "batch", "merge", "flush", "probe",
]
_VERBS = ["load", "parse", "emit", "scan", "fold", "push", "pull", "sync", "pack"]
_LANGS = ["py", "java", "c"]


def _rand_ident(rng: np.random.RandomState) -> str:
    return "%s_%s" % (rng.choice(_VERBS), rng.choice(_IDENTS))


def _base_file(rng: np.random.RandomState, lang: str, n_stmts: int) -> str:
    """A plausible source file: functions with assignments/loops/returns."""
    lines: list[str] = []
    comment = "#" if lang == "py" else "//"
    lines.append(f"{comment} module {_rand_ident(rng)}")
    fname = _rand_ident(rng)
    if lang == "py":
        lines.append(f"def {fname}(a, b):")
        indent = "    "
    elif lang == "java":
        lines.append(f"static long {fname}(long a, long b) {{")
        indent = "    "
    else:
        lines.append(f"long {fname}(long a, long b) {{")
        indent = "    "
    vars_ = [_rand_ident(rng) for _ in range(4)]
    for _ in range(n_stmts):
        v = rng.choice(vars_)
        w = rng.choice(vars_)
        op = rng.choice(["+", "-", "*", "%"])
        c = int(rng.randint(1, 1000))
        semi = "" if lang == "py" else ";"
        kind = rng.randint(0, 4)
        if kind == 0:
            lines.append(f"{indent}{v} = {w} {op} {c}{semi}")
        elif kind == 1:
            lines.append(f"{indent}{v} = {v} {op} a{semi}")
        elif kind == 2:
            if lang == "py":
                lines.append(f"{indent}if {v} > {c}:")
                lines.append(f"{indent}    {w} = {w} {op} b")
            else:
                lines.append(f"{indent}if ({v} > {c}) {{ {w} = {w} {op} b; }}")
        else:
            lines.append(f"{indent}{comment} {_rand_ident(rng)} step {c}")
    if lang == "py":
        lines.append(f"{indent}return {vars_[0]}")
    else:
        lines.append(f"{indent}return {vars_[0]};")
        lines.append("}")
    return "\n".join(lines)


def _mutate(rng: np.random.RandomState, content: str, ops: list[str]) -> str:
    out = content
    for op in ops:
        if op == "ws":
            lines = out.split("\n")
            k = rng.randint(0, len(lines))
            lines.insert(k, "")
            out = "\n".join(" " + l if rng.rand() < 0.15 else l for l in lines)
        elif op == "comment":
            lines = out.split("\n")
            mark = "#" if lines and lines[0].startswith("#") else "//"
            k = rng.randint(1, max(len(lines), 2))
            lines.insert(k, f"{mark} note {_rand_ident(rng)}")
            out = "\n".join(lines)
        elif op == "rename":
            old = rng.choice([w for w in _IDENTS if w in out] or _IDENTS)
            new = f"{old}{rng.randint(2, 9)}"
            out = out.replace(old, new)
        elif op == "insert":
            lines = out.split("\n")
            k = rng.randint(1, max(len(lines), 2))
            lines.insert(k, f"    extra_{rng.randint(0, 99)} = {rng.randint(1, 500)}")
            out = "\n".join(lines)
    return out


def generate_code_files(
    n_files: int, seed: int = 42, dup_fraction: float = 0.4
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (code_files, truth) pandas frames.

    truth columns: repo, path, commit, kind, group_id.  group_id is shared
    within a planted group; singletons get a unique group_id.
    """
    rng = np.random.RandomState(seed)
    rows: list[tuple[str, str, str, str, str]] = []
    truth: list[tuple[str, str, str, str, int]] = []
    gid = 0

    def make_block(tag: int) -> str:
        # per-group verbatim block: keeps fingerprint buckets bounded (a
        # single global block would put every 'block' file in one bucket —
        # quadratic candidate blowup at bench sizes)
        return "\n".join(
            f"    table_{tag}_{i} = lookup_{i % 7}({i} * stride + base_{tag}_{i % 5})"
            for i in range(18)
        )

    def emit(content: str, lang: str, kind: str, group: int) -> None:
        i = len(rows)
        repo = f"org{i % 97}/repo{i % 31}"
        path = f"src/m{i % 13}/f{i}.{lang}"
        commit = f"{abs(hash((seed, i))) % (16**10):010x}"
        rows.append((repo, path, commit, lang, content))
        truth.append((repo, path, commit, kind, group))

    n_planted = int(n_files * dup_fraction)
    budget_near = int(n_planted * 0.55)
    budget_short = int(n_planted * 0.15)
    budget_exact = int(n_planted * 0.15)
    budget_block = n_planted - budget_near - budget_short - budget_exact

    # near-dup groups
    made = 0
    while made < budget_near:
        gid += 1
        lang = _LANGS[rng.randint(0, 3)]
        size = int(rng.randint(2, 6))
        base = _base_file(rng, lang, int(rng.randint(25, 70)))
        emit(base, lang, "near", gid)
        made += 1
        for _ in range(size - 1):
            if made >= budget_near:
                break
            ops = list(rng.choice(["ws", "comment", "rename", "insert"], size=rng.randint(1, 3)))
            emit(_mutate(rng, base, ops), lang, "near", gid)
            made += 1

    # short-file groups (SimHash path)
    made = 0
    while made < budget_short:
        gid += 1
        lang = _LANGS[rng.randint(0, 3)]
        base = _base_file(rng, lang, int(rng.randint(3, 7)))
        emit(base, lang, "short", gid)
        made += 1
        if made < budget_short:
            # rename (a real token change): comment-only variants normalize
            # to identical text and collapse in level-2 exact dedup, which
            # would leave the SimHash path unexercised
            emit(_mutate(rng, base, ["rename"]), lang, "short", gid)
            made += 1

    # exact copies
    made = 0
    while made < budget_exact:
        gid += 1
        lang = _LANGS[rng.randint(0, 3)]
        base = _base_file(rng, lang, int(rng.randint(20, 50)))
        emit(base, lang, "exact", gid)
        made += 1
        if made < budget_exact:
            emit(base, lang, "exact", gid)
            made += 1

    # shared-long-block pairs (suffix path; distinct group per pair)
    made = 0
    while made < budget_block:
        gid += 1
        lang = "py"
        long_block = make_block(gid)
        a = _base_file(rng, lang, int(rng.randint(30, 60))) + "\n" + long_block
        b = _base_file(rng, lang, int(rng.randint(30, 60))) + "\n" + long_block
        emit(a, lang, "block", gid)
        made += 1
        if made < budget_block:
            emit(b, lang, "block", gid)
            made += 1

    # background singletons
    while len(rows) < n_files:
        gid += 1
        lang = _LANGS[rng.randint(0, 3)]
        emit(_base_file(rng, lang, int(rng.randint(15, 80))), lang, "uniq", gid)

    code_files = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    truth_df = pd.DataFrame(truth, columns=["repo", "path", "commit", "kind", "group_id"])
    return code_files, truth_df
