"""Round-end preflight: every gate the driver/judge will apply, one command.

Prints the round-start ritual FIRST (open ADVICE.md items + the window
allocation verdict), so even a half-lost round makes the highest-leverage
move before anything else — the round-6 lesson.

Runs (in order, fail-fast):
  1. full pytest suite           (sf0.001 oracle parity + unit tests)
  2. full-registry sf0.01 sweep  (the driver's correctness-gate scale)
  3. oracle TYPE audit @ sf0.01  (driver hash is type-sensitive AND its
                                  pandas path rounds decimals above 2^53;
                                  pytest parity sees neither — the
                                  round-5/6 lessons; sf0.01 so overflow
                                  magnitudes match the driver's scale)
  4. window-policy + allocation  (every never-driver-verified key should
                                  hold one of the 50 driver slots)

Usage: python scripts/preflight.py  (~20 min total on local[32])
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"\n=== {label} ===", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e)
    if r.returncode != 0:
        print(f"PREFLIGHT FAILED at: {label}", file=sys.stderr)
        sys.exit(r.returncode)


def window_allocation() -> None:
    sys.path.insert(0, REPO)
    from tests.test_window_policy import compute_changed_keys
    from zip_to_parquet_spark.plans import all_queries

    keys = list(all_queries())
    window = set(keys[:50])
    _, green, _ = compute_changed_keys()
    never = {k for k in keys if k not in green}
    outside = sorted(never - window)
    print(
        f"registry {len(keys)} keys; never-driver-verified {len(never)}, "
        f"{len(never & window)} inside the 50-slot window"
    )
    if len(never) <= 50 and outside:
        print(f"PREFLIGHT FAILED: re-pin — slots free but {outside} outside")
        sys.exit(1)
    if outside:
        print(f"note: {len(outside)} never-verified key(s) overflow the "
              f"window (more than 50 exist): {outside}")


def open_advice() -> None:
    """Round-start ritual: surface ADVICE.md's items before any gate runs."""
    path = os.path.join(REPO, "ADVICE.md")
    print("=== open ADVICE.md items (apply these FIRST) ===")
    if not os.path.exists(path):
        print("  (no ADVICE.md)")
        return
    with open(path) as f:
        for line in f:
            if line.lstrip().startswith("- **"):
                print(" ", line.rstrip())


if __name__ == "__main__":
    open_advice()
    window_allocation()
    run("pytest (full suite, sf0.001)", [sys.executable, "-m", "pytest", "tests/", "-q"])
    run(
        "oracle parity sweep @ sf0.01",
        [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py", "-q"],
        env={"SPARK_GRAFT_SF_DIR_TEST": "/root/testdata/sf0.01"},
    )
    run(
        "oracle TYPE + overflow audit @ sf0.01",
        [sys.executable, "scripts/audit_oracle_types.py", "/root/testdata/sf0.01"],
    )
    run(
        "static headroom linter (64-bit product sites)",
        [sys.executable, "scripts/audit_headroom.py"],
    )
    window_allocation()
    print("\nPREFLIGHT GREEN")
