"""Automated driver-window policy (VERDICT r3 ask #2).

Policy (set in round 2, violated for streaming in round 3): any query key
whose implementing code changed since the key's LAST driver-green round
must sit inside the driver's first-50 correctness window, so the next
CORRECTNESS_r{N}.json re-verifies it at sf0.01.

This test automates the bookkeeping end-to-end from repo history — no
manually-maintained JSON to rot:

* last green round per key  = the highest CORRECTNESS_r*.json containing
  the key with ``hash_match: true`` (or a rows-only ``no_oracle`` row —
  that IS that key's strongest possible driver signal);
* the code the driver verified = the tree at the commit that ADDED that
  round's CORRECTNESS file (the driver commits results on the final tree
  of the round);
* implementing code per key   = the transitive package-import closure of
  the key's defining plans module (deferred in-function imports
  included — the regex scans whole sources);
* changed                     = ``git diff`` from that commit to the
  WORKING TREE touches any file in the closure (so the test bites before
  commit, not after).

Rule: with C = changed-or-never-verified keys and W = the first-50
window — if |C| ≤ 50 then C ⊆ W (every changed key gets a driver row
next round); if |C| > 50 the window can't hold them all, so every slot
must at least be SPENT on a changed key (prioritization, the best any
round can do).
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "zip_to_parquet_spark"
WINDOW = 50


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        check=True,
        capture_output=True,
        text=True,
    ).stdout


def _module_file(dotted: str) -> str | None:
    """'zip_to_parquet_spark.operators.vectors' → repo-relative file."""
    rel = Path(dotted.replace(".", "/"))
    if (REPO / rel).with_suffix(".py").exists():
        return str(rel.with_suffix(".py"))
    if (REPO / rel / "__init__.py").exists():
        return str(rel / "__init__.py")
    return None


def _import_closure() -> dict[str, set[str]]:
    """file → transitive set of package files it imports (itself included)."""
    edges: dict[str, set[str]] = {}
    for f in (REPO / PKG).rglob("*.py"):
        rel = str(f.relative_to(REPO))
        src = f.read_text()
        deps: set[str] = set()
        for m in re.finditer(
            rf"^\s*from\s+({PKG}[.\w]*)\s+import\s+([^\n]+)", src, re.M
        ):
            base, names = m.group(1), m.group(2)
            bf = _module_file(base)
            if bf:
                deps.add(bf)
            # `from pkg.plans import llm, relational` imports submodules.
            for name in re.findall(r"\w+", names.split("#")[0]):
                sub = _module_file(f"{base}.{name}")
                if sub:
                    deps.add(sub)
        for m in re.finditer(rf"^\s*import\s+({PKG}[.\w]*)", src, re.M):
            bf = _module_file(m.group(1))
            if bf:
                deps.add(bf)
        edges[rel] = deps
    closure: dict[str, set[str]] = {}

    def walk(node: str, acc: set[str]) -> None:
        if node in acc:
            return
        acc.add(node)
        for dep in edges.get(node, ()):
            walk(dep, acc)

    for node in edges:
        acc: set[str] = set()
        walk(node, acc)
        closure[node] = acc
    return closure


def _last_green_rounds() -> dict[str, int]:
    """key → highest round with a driver row that counts as verified."""
    green: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for key, res in json.loads(f.read_text()).items():
            if res.get("hash_match") or res.get("err") == "no_oracle":
                green[key] = max(green.get(key, 0), rnd)
    return green


def _round_commit(rnd: int) -> str | None:
    """The commit that ADDED CORRECTNESS_r{rnd}.json (driver round end)."""
    out = _git(
        "log",
        "--format=%H",
        "--diff-filter=A",
        "--",
        f"CORRECTNESS_r{rnd:02d}.json",
    ).strip()
    return out.splitlines()[0] if out else None


# Sentinel: "every file changed" — used when a round's CORRECTNESS file has
# no owning commit (untracked / rewritten history), so we cannot know what
# tree the driver verified.  Treating that as "nothing changed" would
# silently waive the policy (VERDICT r4 ask #3); instead every key last
# green in that round counts as changed, which is loud.
_ALL_CHANGED = object()


def compute_changed_keys() -> tuple[set[str], dict[str, int], list[str]]:
    """(changed keys, key → last green round, registry order).

    Shared by the policy test below and ``scripts/window_pin.py`` so the
    re-pin suggestion and the test verdict can never disagree.
    """
    from zip_to_parquet_spark.plans import all_queries
    from zip_to_parquet_spark.plans.registry import key_modules

    keys = list(all_queries())
    modules = key_modules()
    closure = _import_closure()
    green = _last_green_rounds()

    # Changed files since each round's driver run (vs the WORKING TREE),
    # computed once per distinct round.
    changed_since: dict[int, object] = {}
    for rnd in set(green.values()):
        sha = _round_commit(rnd)
        changed_since[rnd] = (
            set(_git("diff", "--name-only", sha, "--", PKG).splitlines())
            if sha
            else _ALL_CHANGED
        )

    changed: set[str] = set()
    for key in keys:
        mod_file = _module_file(modules[key])
        if key not in green:
            changed.add(key)  # never had a driver row
            continue
        since = changed_since[green[key]]
        if since is _ALL_CHANGED:
            changed.add(key)  # round commit unknown → assume changed (loud)
            continue
        files = closure.get(mod_file, {mod_file})
        if files & since:
            changed.add(key)
    return changed, green, keys


def policy_verdict(changed: set[str], keys: list[str]) -> str | None:
    """None if the window satisfies the policy, else the failure message.
    THE verdict — shared by the test below and scripts/window_pin.py so
    the script's OK/FAIL can never drift from what the test asserts."""
    window = set(keys[:WINDOW])
    if len(changed) <= WINDOW:
        outside = sorted(changed - window)
        if outside:
            return (
                f"{len(outside)} changed key(s) outside the first-{WINDOW} "
                f"driver window — re-pin set_priority in "
                f"{PKG}/plans/__init__.py: {outside}"
            )
    else:
        wasted = sorted(window - changed)
        if wasted:
            return (
                f"{len(changed)} keys changed (> window of {WINDOW}) but "
                f"these window slots hold UNCHANGED keys — swap them for "
                f"changed ones: {wasted}"
            )
    return None


def test_changed_keys_are_inside_driver_window():
    changed, _green, keys = compute_changed_keys()
    verdict = policy_verdict(changed, keys)
    assert verdict is None, verdict


def test_missing_round_commit_marks_all_its_keys_changed(monkeypatch):
    """VERDICT r4 ask #3: a CORRECTNESS file with no owning commit (e.g.
    still untracked at round start) must mark every key last-green in that
    round as CHANGED — a loud re-verify demand — never silently unchanged."""
    import sys

    mod = sys.modules[__name__]
    monkeypatch.setattr(mod, "_round_commit", lambda rnd: None)
    changed, green, keys = compute_changed_keys()
    # With every round commit "missing", every key that ever went green must
    # be flagged (never-green keys are changed by definition already).
    assert changed == set(keys)
    assert set(green) <= changed


def test_window_policy_detects_plan_module_edit(tmp_path):
    """The machinery itself: the closure must tie every registered key to
    its defining plans module, and that module's closure must include the
    operator modules it imports (an edit anywhere in the closure flags
    the key)."""
    from zip_to_parquet_spark.plans.registry import key_modules

    closure = _import_closure()
    modules = key_modules()
    llm_file = _module_file(modules["ann_pq_topk"])
    assert llm_file == f"{PKG}/plans/llm.py"
    assert f"{PKG}/operators/vectors.py" in closure[llm_file]
    assert f"{PKG}/schema.py" in closure[llm_file]
    zip_file = _module_file(modules["zip_explode_hash"])
    assert f"{PKG}/sources/zipsource.py" in closure[zip_file]


def test_hot_shingle_guard_sql_in_sync_across_all_oracles():
    """Finding from the round-5 review: the hot-shingle predicate appears
    in several oracle strings. Every occurrence must equal the ONE
    generator in operators/dedupe.py — a constant change that forgets an
    oracle fails here instead of as a driver hash mismatch."""
    from zip_to_parquet_spark.operators.dedupe import duck_hot_having_sql
    from zip_to_parquet_spark.plans import all_oracle_sql

    want = duck_hot_having_sql("SELECT count(*) FROM s")
    hits = 0
    for name, sql in all_oracle_sql().items():
        for line in sql.splitlines():
            if "HAVING" in line and "1000" in line:
                hits += 1
                assert want in line.strip(), (name, line.strip(), want)
    assert hits >= 5  # jaccard, containment, clusters x2, keep_best


def test_headroom_linter_clean():
    """scripts/audit_headroom.py: no BIGINT product of data-sized columns
    without 128-bit widening or a whitelisted documented bound (the
    round-8 overflow-divergence class must not regress)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "audit_headroom",
        Path(__file__).resolve().parents[1] / "scripts" / "audit_headroom.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0


def test_headroom_linter_flags_stale_whitelist_and_source_sites():
    """VERDICT r8 ask #6 + ADVICE r8: the linter must (a) fail on a
    whitelist entry that matches no current hit (dead entries are how
    linters rot), (b) match whitelist fragments against the FLAGGED
    fragment, not the whole text, and (c) actually scan plans/ source
    functions, not just oracles."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "audit_headroom_stale",
        Path(__file__).resolve().parents[1] / "scripts" / "audit_headroom.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # (a) a fabricated entry that can never match a hit -> stale -> exit 1
    fake = ("no_such_key", "sum(ghost * ghost)")
    mod.WHITELIST.add(fake)
    try:
        hits, stale = mod.run()
        assert fake in stale
        assert mod.main() == 1
    finally:
        mod.WHITELIST.discard(fake)

    # (b) a whitelisted fragment suppresses ONLY its own site: the same
    # owner with a different unwidened product still reports.
    hits: list = []
    used: set = set()
    mod.scan_text(
        "sample_effective_size",
        "sum(n_chars * n_chars) ... sum(other * other)",
        hits,
        used,
    )
    assert ("sample_effective_size", "sum(other * other)") in hits
    assert used  # the real site was recognized, not shadowed

    # (c) the source scan sees plans/ function bodies: a BIGINT product
    # in any un-widened top-level function would be reported with a
    # file:function owner. Prove the plumbing by scanning a synthetic
    # body through the same entry point the source scan uses.
    hits2: list = []
    mod.scan_text("plans/fake.py:bad_fn", "F.sum(dev * dev)", hits2, set())
    assert hits2 and hits2[0][0] == "plans/fake.py:bad_fn"
    # and the live tree is clean through the real source scan
    live_hits: list = []
    mod.scan_plans_sources(live_hits, set())
    assert live_hits == []
