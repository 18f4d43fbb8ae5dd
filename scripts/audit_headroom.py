#!/usr/bin/env python
"""Static headroom linter: flag BIGINT products of data-sized columns.

The round-8 sweep found nine keys whose ratio intermediates — literal-scaled
triple products like ``(1000000 * o * o) div (na * nb)`` or squared sums
like ``sum(w) * sum(w)`` — ran in 64-bit integers on the Spark side while
the DuckDB oracle widened to HUGEINT (DuckDB's sum() of BIGINT is HUGEINT,
and BIGINT multiply ERRORS on overflow where Spark silently wraps). That is
a 100 TB divergence sf0.001 parity can never catch: the fixture magnitudes
are tiny. Those nine now square in DECIMAL(38,0) ↔ HUGEINT.

This linter keeps the class from regressing. Two scans (ADVICE r8: the
oracle-only scan overstated its coverage — the Spark side, which WRAPS
silently, is the one that most needs the guard):

1. every registered oracle's SQL, whole-oracle granularity — a widening
   marker anywhere in the oracle clears it (statement-level matching
   false-positives on upstream CTE casts; DuckDB's loud BIGINT-overflow
   error is the runtime backstop for partial-widening keys like the r8
   bh_fdr case);
2. every top-level function in ``plans/*.py`` AND ``operators/*.py``
   SOURCE, function granularity — this is where the Spark-side
   expressions (``F.expr`` strings, Column arithmetic) live, including
   the operator helpers composed keys delegate to (ADVICE r9); a
   widening marker anywhere in the function body clears it.

Patterns:

* a literal scale factor (>= 3 digits) multiplied by two or more column
  terms: ``1000000 * a * b``
* a self- or cross-product of aggregates: ``sum(x) * sum(y)``,
  ``dev * dev``, ``o * o``

Hits survive unless the site is in the whitelist below (reviewed by hand:
either the operands are provably bounded constants/policy knobs, or the
docstring documents the 2^63 envelope). A whitelist entry matches only
when its fragment appears IN the flagged fragment — one-directional, so
a long whitelist entry cannot suppress a distinct shorter future hit
that happens to be its substring (ADVICE r8, tightened per ADVICE r9). Entries that no longer match any current hit are themselves
reported as STALE and fail the run — dead whitelist lines are how linters
rot (VERDICT r8 ask #6).

Exit 0 when every hit is whitelisted and every whitelist entry is live;
exit 1 with a report otherwise. Run it after adding keys, alongside
scripts/audit_oracle_types.py.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Hand-reviewed sites where 64-bit arithmetic is provably safe or the
# envelope is documented in the key's docstring. Format: (key-or-
# file:function, substring of the FLAGGED fragment; matching is
# one-directional — the entry must appear in the fragment).
WHITELIST: set[tuple[str, str]] = {
    # per-element products of bounded fixture weights; docstring documents
    # the BIGINT output-column bound (w2_sum < 2^63). Fragment narrowed to
    # the bare product when matching became one-directional (ADVICE r9):
    # the SELF_PRODUCT pattern flags `n_chars * n_chars` with and without
    # the enclosing sum().
    ("sample_effective_size", "n_chars * n_chars"),
    # float64 numpy arithmetic (squared-L2 per Arrow batch) — the integer
    # wraparound class this linter polices cannot occur in doubles.
    ("zip_to_parquet_spark/operators/vectors.py:pq_encode_udf",
     "diff * diff"),
    # y in {0,1}: y * n_rows == n_rows, no growth.
    ("feature_target_encode_loo", "sum(y * n_rows)"),
    # Four r8-era entries (retrieval_rrf_fuse, lm_good_turing_counts,
    # stats_bh_fdr_cells x2) were removed when fragment-level matching +
    # stale detection landed: their oracles carry widening markers, so
    # the pattern never fires there and the entries were dead.
}

SCALE_PRODUCT = re.compile(
    r"\(?\b\d{3,}(?:::HUGEINT|L)?\s*\*\s*[\w.]+\s*\*\s*[\w.]+"
)
SELF_PRODUCT = re.compile(
    r"\b(sum\([\w. *]+\)|[\w.]+)\s*\*\s*\1\b"
)
AGG_PRODUCT = re.compile(r"sum\(([\w.]+)\s*\*\s*([\w.]+)\)")
WIDE = re.compile(r"HUGEINT|DECIMAL\s*\(\s*38|decimal\(38|D38", re.I)


def scan_text(
    owner: str,
    text: str,
    hits: list[tuple[str, str]],
    used: set[tuple[str, str]],
) -> None:
    """Collect unwhitelisted pattern hits in one oracle / function body."""
    if WIDE.search(text):
        return  # site already thinks in 128-bit terms somewhere
    for pat in (SCALE_PRODUCT, SELF_PRODUCT, AGG_PRODUCT):
        for m in pat.finditer(text):
            frag = m.group(0).strip()
            matched = [
                w for w in WHITELIST if w[0] == owner and w[1] in frag
            ]
            if matched:
                used.update(matched)
                continue
            hits.append((owner, frag))


def scan_plans_sources(
    hits: list[tuple[str, str]], used: set[tuple[str, str]]
) -> None:
    """Scan each top-level function in plans/*.py and operators/*.py at
    function granularity.

    The Spark-side expressions live in these bodies — including the
    operator helpers that composed keys delegate to (ADVICE r9); widening
    markers (``decimal(38`` / ``D38``) anywhere in the function clear it,
    same rationale as the whole-oracle rule."""
    pkg = REPO / "zip_to_parquet_spark"
    files = sorted((pkg / "plans").glob("*.py")) + sorted(
        (pkg / "operators").glob("*.py")
    )
    for f in files:
        src = f.read_text()
        rel = f.relative_to(REPO)
        for node in ast.parse(src).body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                seg = ast.get_source_segment(src, node) or ""
                scan_text(f"{rel}:{node.name}", seg, hits, used)


def run() -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """(unwhitelisted hits, stale whitelist entries)."""
    from zip_to_parquet_spark.plans import all_oracle_sql

    hits: list[tuple[str, str]] = []
    used: set[tuple[str, str]] = set()
    for key, sql in all_oracle_sql().items():
        scan_text(key, sql, hits, used)
    scan_plans_sources(hits, used)
    stale = sorted(WHITELIST - used)
    return hits, stale


def main() -> int:
    hits, stale = run()
    if hits:
        print(f"{len(hits)} unwhitelisted headroom hits:")
        for owner, frag in hits:
            print(f"  {owner}: {frag}")
    if stale:
        print(f"{len(stale)} STALE whitelist entries (match no current hit):")
        for owner, frag in stale:
            print(f"  {owner}: {frag}")
    if hits or stale:
        return 1
    print(
        "headroom audit clean: 0 unwhitelisted 64-bit product sites, "
        f"{len(WHITELIST)} whitelist entries all live"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
