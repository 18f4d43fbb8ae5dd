#!/usr/bin/env python
"""Print the current changed-key set and a suggested 50-key driver window.

VERDICT r4 ask #8: re-pinning ``set_priority`` at 121 keys should be
mechanical, not archaeological.  This reuses the window-policy test's own
closure logic (``tests/test_window_policy.py:compute_changed_keys``) so the
suggestion and the test verdict cannot disagree.

Usage::

    python scripts/window_pin.py            # report + suggested window
    python scripts/window_pin.py --list     # suggested window only, one per
                                            # line (paste into set_priority)

Suggested-window ordering when more keys changed than the window holds:

1. never-driver-verified keys (no green row in any round), registry order —
   a key with zero driver history outranks one with a stale green row;
2. changed previously-green keys, oldest last-green round first (the row
   most likely to have rotted), then registry order.

Once the never-checked backlog is zero and few keys change per round
(VERDICT r9 ask #7), the top-up branch takes over and the suggestion IS
the oldest-green-first refresh rotation: changed keys first, then frozen
keys ordered by last-green round ascending — run this at round start and
paste the ``--list`` output into ``set_priority`` as the round's first
commit.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_spec = importlib.util.spec_from_file_location(
    "window_policy", REPO / "tests" / "test_window_policy.py"
)
_wp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_wp)

WINDOW = _wp.WINDOW


def suggest() -> tuple[list[str], set[str], dict[str, int], list[str]]:
    changed, green, keys = _wp.compute_changed_keys()
    order = {k: i for i, k in enumerate(keys)}
    never = [k for k in keys if k in changed and k not in green]
    stale = sorted(
        (k for k in changed if k in green),
        key=lambda k: (green[k], order[k]),
    )
    suggestion = (never + stale)[:WINDOW]
    if len(changed) < WINDOW:
        # Top up with frozen keys, oldest green first, to spend every slot.
        frozen = sorted(
            (k for k in keys if k not in changed),
            key=lambda k: (green.get(k, 0), order[k]),
        )
        suggestion += frozen[: WINDOW - len(suggestion)]
    return suggestion, changed, green, keys


def main() -> None:
    suggestion, changed, green, keys = suggest()
    if "--list" in sys.argv:
        print("\n".join(suggestion))
        return
    window = set(keys[:WINDOW])
    print(f"registry keys : {len(keys)}")
    print(f"changed keys  : {len(changed)} (window = {WINDOW})")
    never = sorted(k for k in changed if k not in green)
    print(f"  never driver-verified ({len(never)}): {never}")
    stale = sorted((k for k in changed if k in green), key=lambda k: green[k])
    for k in stale:
        print(f"  changed since r{green[k]}: {k}")
    ok_in = sorted(changed & window)
    bad_in = sorted(window - changed)
    print(f"current window: {len(ok_in)} changed / {len(bad_in)} frozen slots")
    sys.path.insert(0, str(REPO / "tests"))
    from test_window_policy import policy_verdict

    verdict = policy_verdict(changed, keys)
    print(f"  POLICY FAIL — {verdict}" if verdict else "  policy OK")
    print("\nsuggested window (use --list for paste-ready form):")
    for i, k in enumerate(suggestion):
        tag = "new" if k not in green else f"r{green[k]}"
        print(f"  {i + 1:2d}. {k}  [{tag}]")


if __name__ == "__main__":
    main()
