#!/usr/bin/env python
"""Interleaved A/B probe (round 14, guide §1): alternate tools/measure.py
runs between two checkouts (OLD = the r13-HEAD worktree, NEW = this repo)
so host drift cannot masquerade as a code delta.  Each leg is a fresh
process/session timing the named queries via the noop sink (warmup +
median-of-3, bench methodology).

  python tools/ab.py /root/wt_r13 /root/repo 3 q1 q2 ...
"""

from __future__ import annotations

import os
import re
import subprocess
import sys


def run_leg(root: str, names: list[str]) -> dict[str, tuple[float, float]]:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    p = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "measure.py"), "time", *names],
        cwd=root, env=env, capture_output=True, text=True, timeout=1800,
    )
    out: dict[str, tuple[float, float]] = {}
    for m in re.finditer(r"^(\S+): med=([\d.]+) min=([\d.]+)", p.stdout, re.M):
        out[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    if not out:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
    return out


def main() -> None:
    old_root, new_root, rounds, names = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4:]
    )
    acc: dict[str, dict[str, list[float]]] = {
        n: {"old_med": [], "old_min": [], "new_med": [], "new_min": []}
        for n in names
    }
    for r in range(rounds):
        for tag, root in (("old", old_root), ("new", new_root)):
            got = run_leg(root, names)
            for n, (med, mn) in got.items():
                acc[n][f"{tag}_med"].append(med)
                acc[n][f"{tag}_min"].append(mn)
            print(f"round {r} {tag}: " + " ".join(
                f"{n}={got.get(n, (float('nan'),))[0]:.2f}" for n in names
            ), flush=True)
    print("\n== summary (median-of-legs of per-leg med | min-of-legs of min) ==")
    for n in names:
        a = acc[n]
        if not a["old_med"] or not a["new_med"]:
            print(f"{n}: MISSING LEG DATA")
            continue
        om = sorted(a["old_med"])[len(a["old_med"]) // 2]
        nm = sorted(a["new_med"])[len(a["new_med"]) // 2]
        print(
            f"{n}: old med {om:.3f} min {min(a['old_min']):.3f} | "
            f"new med {nm:.3f} min {min(a['new_min']):.3f} | "
            f"med speedup {om / nm if nm else float('inf'):.2f}x"
        )


if __name__ == "__main__":
    main()
