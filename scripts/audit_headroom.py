#!/usr/bin/env python
"""Static headroom linter: flag BIGINT products of data-sized columns.

The round-8 sweep found nine keys whose ratio intermediates — literal-scaled
triple products like ``(1000000 * o * o) div (na * nb)`` or squared sums
like ``sum(w) * sum(w)`` — ran in 64-bit integers on the Spark side while
the DuckDB oracle widened to HUGEINT (DuckDB's sum() of BIGINT is HUGEINT,
and BIGINT multiply ERRORS on overflow where Spark silently wraps). That is
a 100 TB divergence sf0.001 parity can never catch: the fixture magnitudes
are tiny. Those nine now square in DECIMAL(38,0) ↔ HUGEINT.

This linter keeps the class from regressing. It scans every registered
oracle's SQL and every plans/ module's source for the suspicious patterns:

* a literal scale factor (>= 3 digits) multiplied by two or more column
  terms: ``1000000 * a * b``
* a self- or cross-product of aggregates: ``sum(x) * sum(y)``,
  ``dev * dev``, ``o * o``

and reports each hit whose ORACLE contains no widening marker anywhere —
``HUGEINT``, ``DECIMAL(38``/``decimal(38`` — unless the site is in the
whitelist below (reviewed by hand: either the operands are provably
bounded constants/policy knobs, or the docstring documents the 2^63
envelope). Whole-oracle granularity is deliberate: statement-level
matching false-positives on upstream CTE casts, and the real r8 finds
were mostly keys with ZERO widening anywhere. A key that widens SOME
products but misses one (the r8 bh_fdr case) still needs the manual
sweep; DuckDB's loud BIGINT-overflow error is the runtime backstop on
the oracle side — the linter exists for the Spark side, which wraps
silently.

Exit 0 when every hit is whitelisted; exit 1 with a report otherwise.
Run it after adding keys, alongside scripts/audit_oracle_types.py.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Hand-reviewed sites where 64-bit arithmetic is provably safe or the
# envelope is documented in the key's docstring. Format: (key-or-file,
# substring of the flagged expression).
WHITELIST: set[tuple[str, str]] = {
    # rank-bounded: rank_lex/rank_sem <= k (policy constant), 1e9/(60+r)
    ("retrieval_rrf_fuse", "1000000000 // (60 + rank_lex)"),
    ("retrieval_rrf_fuse", "1000000000 // (60 + rank_sem)"),
    # per-element products of bounded fixture weights; docstring documents
    # the BIGINT output-column bound (w2_sum < 2^63).
    ("sample_effective_size", "sum(n_chars * n_chars)"),
    # y in {0,1}: y * n_rows == n_rows, no growth.
    ("feature_target_encode_loo", "sum(y * n_rows)"),
    # r * n_r <= n_tokens by construction; the SCALED products widened in
    # r8, this is the raw total (bounded by corpus tokens, documented).
    ("lm_good_turing_counts", "sum(r * n_r)"),
    # p_num/p_den raw-rational columns: documented BIGINT bound in the
    # bh_fdr_hour_cells docstring (exact while dev24 < 2^31.5).
    ("stats_bh_fdr_cells", "(h.dev24 * h.dev24)::BIGINT AS p_den"),
    ("stats_bh_fdr_cells", "(23 * h.n)::BIGINT AS p_num"),
}

SCALE_PRODUCT = re.compile(
    r"\(?\b\d{3,}(?:::HUGEINT|L)?\s*\*\s*[\w.]+\s*\*\s*[\w.]+"
)
SELF_PRODUCT = re.compile(
    r"\b(sum\([\w. *]+\)|[\w.]+)\s*\*\s*\1\b"
)
AGG_PRODUCT = re.compile(r"sum\(([\w.]+)\s*\*\s*([\w.]+)\)")
WIDE = re.compile(r"HUGEINT|DECIMAL\s*\(\s*38|decimal\(38|D38", re.I)


def statement_of(text: str, pos: int) -> str:
    """The line plus its two neighbours — enough context to see a cast."""
    lines = text.splitlines(keepends=True)
    acc, idx = 0, 0
    for i, ln in enumerate(lines):
        if acc + len(ln) > pos:
            idx = i
            break
        acc += len(ln)
    lo, hi = max(0, idx - 2), min(len(lines), idx + 3)
    return "".join(lines[lo:hi])


def scan_text(owner: str, text: str, hits: list[tuple[str, str]]) -> None:
    if WIDE.search(text):
        return  # key already thinks in 128-bit terms somewhere
    for pat in (SCALE_PRODUCT, SELF_PRODUCT, AGG_PRODUCT):
        for m in pat.finditer(text):
            frag = m.group(0).strip()
            if any(
                owner == w_owner and w_frag in text
                for w_owner, w_frag in WHITELIST
            ):
                continue
            hits.append((owner, frag))


def main() -> int:
    from zip_to_parquet_spark.plans import all_oracle_sql

    hits: list[tuple[str, str]] = []
    for key, sql in all_oracle_sql().items():
        scan_text(key, sql, hits)

    if hits:
        print(f"{len(hits)} unwhitelisted headroom hits:")
        for owner, frag in hits:
            print(f"  {owner}: {frag}")
        return 1
    print("headroom audit clean: 0 unwhitelisted 64-bit product sites")
    return 0


if __name__ == "__main__":
    sys.exit(main())
