"""Rotation planner — computes the NEXT round's PRIORITY window from
the checked-in CORRECTNESS_r*.json artifacts, so the round-open
rotation is a copy-paste instead of hand arithmetic (which miscounted
twice in round 9 and drove the round-11 standing-red gate).

    python tests/plan_rotation.py              # plan from current artifacts
    python tests/plan_rotation.py --verify     # exit 1 if the CURRENT
                                               # PRIORITY violates the plan's
                                               # must-lead set (pre-commit aid)

--verify is meaningful ONLY at round open (ADVICE r12): it compares the
NEXT round's must-lead set against the CURRENT window, so it is
*definitionally* failing from the moment a new CORRECTNESS artifact
lands until the round-open rotation commit — that exit 1 is the
forcing function firing, not a bug.  Do NOT wire it into CI or
pre-commit; the always-on staleness gate is
tests/test_registry_order.py::test_driver_row_staleness_bound, which
keys off the committed artifacts and stays green mid-round.

Rules encoded (the same ones tests/test_registry_order.py gates):
 - every query whose last driver row would exceed MAX_DRIVER_ROW_AGE
   when the NEXT artifact lands MUST be in the next window (must-lead);
 - fill the remainder greedy-oldest-first;
 - modified-this-round and newly-added queries are the session's job to
   splice in (the planner leaves slack lines for them);
 - PRIORITY + PRIORITY_NEXT must sum to exactly DRIVER_WINDOW.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

sys.path.insert(0, str(REPO))

from etl_wildweb_spark import registry  # noqa: E402
from tests.test_registry_order import (  # noqa: E402
    DRIVER_WINDOW,
    MAX_DRIVER_ROW_AGE,
)


def last_rows() -> tuple[dict[str, int], int]:
    last: dict[str, int] = {}
    latest = 0
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        latest = max(latest, rnd)
        for name in json.loads(p.read_text()):
            last[name] = max(last.get(name, 0), rnd)
    return last, latest


def plan() -> tuple[list[str], list[str], int]:
    """(must_lead, greedy_fill, next_round).  must_lead = queries that
    go red the moment CORRECTNESS_r{next+1} lands unless re-checked in
    round next; greedy_fill = oldest-first remainder up to the window."""
    registry.load_all()
    last, latest = last_rows()
    nxt = latest + 1
    live = set(registry.QUERIES)
    never = sorted(live - set(last))  # additions not yet driver-checked
    # a query red-lines in round `nxt` the moment CORRECTNESS_r{nxt}
    # lands: latest becomes nxt, so red iff nxt - last > AGE
    must = sorted(
        n for n in live if n in last and nxt - last[n] > MAX_DRIVER_ROW_AGE
    )
    rest = sorted(
        (n for n in live if n in last and n not in must),
        key=lambda n: (last[n], n),
    )
    fill = rest[: max(0, DRIVER_WINDOW - len(must) - len(never))]
    return must + never, fill, nxt


def main() -> int:
    must, fill, nxt = plan()
    if len(must) > DRIVER_WINDOW:
        # ADVICE r12: don't silently emit an infeasible plan — the
        # must-lead set alone exceeds the window, so no rotation can
        # satisfy the staleness bound (the capacity gate's pigeonhole
        # argument has been violated by over-registration).
        print(
            f"# INFEASIBLE: {len(must)} must-lead entries exceed the "
            f"{DRIVER_WINDOW}-slot window — no rotation satisfies "
            f"MAX_DRIVER_ROW_AGE={MAX_DRIVER_ROW_AGE}; consolidate "
            "twinned entries or raise the bound (judge sign-off)",
            file=sys.stderr,
        )
        return 2
    print(f"# rotation plan for round {nxt} "
          f"(window {DRIVER_WINDOW}, max age {MAX_DRIVER_ROW_AGE})")
    print(f"# MUST-LEAD ({len(must)}): red when CORRECTNESS_r{nxt} ages them out,")
    print("# plus never-checked additions")
    for n in must:
        print(f'    "{n}",')
    print(f"# greedy oldest-first fill ({len(fill)}) — swap entries out for")
    print("# modified-this-round re-entries and new additions as needed:")
    for n in fill:
        print(f'    "{n}",')
    if "--verify" in sys.argv[1:]:
        window = set(registry.PRIORITY) | set(registry.PRIORITY_NEXT)
        missing = [n for n in must if n not in window]
        if missing:
            print(f"VERIFY FAIL: must-lead entries missing from the "
                  f"current window: {missing}")
            return 1
        print("VERIFY OK: current window covers every must-lead entry")
    return 0


if __name__ == "__main__":
    sys.exit(main())
