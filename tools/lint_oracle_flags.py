#!/usr/bin/env python3
"""Stated-flag certificate lint (VERDICT r14 item 3).

A certificate oracle that only STATES booleans (`SELECT true AS x`) is
weaker than one that states values: the DuckDB side cannot re-derive a
flag, so a Spark-side expression bug that pins the flag true is invisible
to the driver's hash compare. The r15 sweep added, next to every stated
flag, (a) at least one column the oracle DERIVES from a corpus table and
(b) where the construction is deterministic, the exact integer the flag
summarizes (hit counts, agreement counts, sketch estimates, ranks) so a
regression INSIDE the flag's slack still flips the hash.

This lint enforces the end state:
  1. every oracle containing a stated boolean must also reference at
     least one corpus table (a derivable companion) — no flag-only
     certificates;
  2. every stated-boolean column must appear in the ALLOWED residue
     below, each entry carrying its justification for why DuckDB cannot
     state it as a value (the documented non-derivable residue).

Usage: lint_oracle_flags.py <oracle_sql.json>
Exit 0 = clean; exit 1 = violations (listed on stdout).
"""
import json
import re
import sys

TABLES = ("documents", "embeddings", "lineitem", "orders", "events",
          "customer", "supplier", "part", "nation", "region")

# The justified residue: flag column -> (queries allowed to state it,
# why the value itself is not DuckDB-derivable). '*' = any query.
ALLOWED = {
    # Threshold recall contracts (minhash/simhash planted-pair recovery):
    # sketch recall is >=95%/75%, not exactly 100%, so the recovered-pair
    # SET is sf-dependent and cannot be pinned as values. (The exact-100%
    # ANN recall certificates were converted to derivable hit-qid rows in
    # r16 and no longer state flags.)
    "recall_ok": ("*", "threshold sketch recall; recovered set sf-dependent"),
    "shape_ok": ("*", "per-anchor negK shape check over mined rows"),
    # Artifact-lifecycle stability: requires running the snapshot store
    # twice and comparing, which SQL over the source parquet cannot do.
    "v1_stable": ("*", "before/after comparison across two store reads"),
    "search_pinned_ok": ("*", "search equality over a reloaded artifact"),
    "current_is_v2": ("*", "snapshot-store CURRENT resolution"),
    "current_stable": ("*", "before/after GC comparison"),
    "expired_unreadable": ("*", "filesystem state after manifest GC"),
    "gc_exact": ("*", "data-dir listing vs retained manifest"),
    # Sink/layout facts: filesystem or parquet-footer metadata.
    "range_pruned": ("*", "parquet footer min/max pruning evidence"),
    "codec_ok": ("*", "parquet footer codec field"),
    "files_ok": ("*", "output file-count layout contract"),
    "pruned": ("*", "scan-plan pruning evidence"),
    "staged_name_ok": ("*", "staged->final rename path names"),
    "rejected": ("*", "ingest-time structural rejection outcome"),
    "roundtrip_ok": ("*", "byte equality across an external format"),
    # Trainer/kernel equivalence certificates: both sides live in the
    # engine; the oracle cannot run either. Exact companion integers
    # (n_correct, n_equal, n_counted_pieces) are stated beside them.
    "train_separates": ("*", "distributed trainer accuracy"),
    "estep_ok": ("*", "distributed-vs-driver E-step equality"),
    "coverage_ok": ("*", "trained vocab vs corpus chars"),
    "norm_ok": ("*", "trained piece-probability normalization"),
    "tokens_ok": ("*", "trained tokenizer output bounds"),
    "recrawls_dropped": ("*", "incremental-dedup catalog behavior"),
    "novel_kept": ("*", "incremental-dedup catalog behavior"),
    # PCA basis facts: needs the trained projection.
    "ortho_ok": ("*", "trained PCA basis orthonormality"),
    "sorted_ok": ("*", "trained eigenvalue ordering"),
    "mean_ok": ("*", "centering of the trained projection"),
    "var_ok": ("*", "explained-variance accounting"),
    "identity_ok": ("*", "round-trip through the trained basis"),
    # Sampling/selection facts computed from engine output.
    "subset_ok": ("*", "selected-set containment in engine output"),
    "frac_ok": ("*", "selected-set size vs requested fraction"),
    "order_ok": ("*", "selection respects the stated total order"),
    "capped_ok": ("*", "per-cluster cap on engine output"),
    "best_first_ok": ("*", "within-cluster best-first property"),
    "paths_ok": ("*", "two engine mechanisms compared"),
    # Structural properties of engine-mined pairs / decoded media.
    "pairs_wellformed": ("*", "shape of LSH-mined candidate pairs"),
    "color_ok": ("*", "decoded MJPEG pixel values"),
    "valid_ok": ("*", "sampled segmentation reconstructs the text"),
}

# (?!BOOLEAN\b): `CAST(true AS BOOLEAN)` is a type ascription, not a
# stated flag column.
FLAG_RE = re.compile(r"\b(?:true|false)\s+AS\s+(?!BOOLEAN\b)(\w+)",
                     re.IGNORECASE)


def main():
    sqls = json.load(open(sys.argv[1]))
    violations = []
    n_flagged = 0
    for name in sorted(sqls):
        sql = sqls[name]
        flags = FLAG_RE.findall(sql)
        if not flags:
            continue
        n_flagged += 1
        low = sql.lower()
        if not any(t in low for t in TABLES):
            violations.append(
                (name, "<no-table>", "stated flags with NO derivable companion"))
        for f in flags:
            rule = ALLOWED.get(f)
            if rule is None:
                violations.append((name, f, "stated flag not in justified residue"))
            elif rule[0] != "*" and name not in rule[0]:
                violations.append((name, f, f"flag only allowed for {rule[0]}"))
    for name, col, why in violations:
        print(f"VIOLATION {name}.{col}: {why}")
    print(f"{len(sqls)} oracles, {n_flagged} with stated flags, "
          f"{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
