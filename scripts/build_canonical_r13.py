"""Builds the round-13 canonical bench record: per-query min over the
two chosen fresh runs, the comparable-key diff vs the round-12
canonical table in BASELINE.md, and the dot-separated per-query
listing BASELINE.md records. Usage:

    python scripts/build_canonical_r13.py RUN_A.json RUN_B.json
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    assert set(qa) == set(qb), "run key sets differ"
    mins = {k: min(qa[k], qb[k]) for k in qa}
    total = round(sum(mins.values()), 3)
    print(f"run totals: {a['value']} / {b['value']}; min-of-2 sum {total} "
          f"over {len(mins)} queries")
    print(f"spins: {a.get('cpu_spin_ms')} / {b.get('cpu_spin_ms')} ms; "
          f"loadavg: {a.get('loadavg_1m')} / {b.get('loadavg_1m')}")

    # comparable diff vs the r12 canonical table
    txt = open("BASELINE.md").read()
    sec = txt.split(
        "### Round-12 FINAL bench, 169-query table (post q270/q271) — CANONICAL"
    )[1].split("### ")[0]
    r12 = {m.group(1): float(m.group(2))
           for m in re.finditer(r"(q\d+)\s+([\d.]+)", sec)}
    pref = lambda k: k.split("_")[0]  # noqa: E731
    cur = {pref(k): v for k, v in mins.items()}
    common = sorted(set(r12) & set(cur), key=lambda k: int(k[1:]))
    s12 = sum(r12[k] for k in common)
    s13 = sum(cur[k] for k in common)
    rats = [cur[k] / r12[k] for k in common if r12[k] >= 0.2]
    print(f"comparable-{len(common)} subset: {round(s13,1)} s vs r12's "
          f"{round(s12,1)} s ({round(s13/s12,2)}x); median per-key ratio "
          f"{round(statistics.median(rats),2)}")
    gate = [(k, r12[k], cur[k]) for k in common
            if cur[k] > 1.3 * r12[k] and cur[k] - r12[k] > 0.5]
    print(f"keys beyond the 1.3x/0.5s gate: {len(gate)}")
    for k, o, n in sorted(gate, key=lambda t: t[2] - t[1], reverse=True)[:20]:
        print(f"  {k}: {o} -> {round(n,2)}")

    # the BASELINE.md per-query listing
    items = sorted(cur.items(), key=lambda kv: int(kv[0][1:]))
    parts = [f"{k} {v:.2f}" for k, v in items]
    out, line = [], ""
    for p in parts:
        if len(line) + len(p) + 3 > 72:
            out.append(line + " ·")
            line = p
        else:
            line = (line + " · " + p) if line else p
    out.append(line)
    print()
    print("\n".join(out))


if __name__ == "__main__":
    main()
