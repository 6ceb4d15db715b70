"""Commit-pinned A/B re-timer (the r15/r16 adjudication protocol).

Times the given catalog queries under two checked-out trees — e.g. HEAD
vs a worktree pinned at a prior round's commit — with the bench's own
methodology: one fresh subprocess per (tree, round) so both sides get an
identical cold-JVM + untimed-warm-up protocol, ALTERNATING sides so
machine drift lands on both, noop-sink timing, and the per-query MIN
across rounds (the machine-band discriminator). Emits one JSON line.

Usage:
    python tools/ab_compare.py <treeA> <treeB> <sf_dir> <rounds> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_DRIVER = """\
import json, sys, time
sys.path.insert(0, sys.argv[1])
from inbev_data_engineering_case_spark.queries import CATALOG
from inbev_data_engineering_case_spark.session import get_spark
sf_dir, names = sys.argv[2], sys.argv[3:]
spark = get_spark("ab-compare")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    if name not in CATALOG:
        continue
    def one():
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        return time.perf_counter() - t0
    one()  # untimed warm-up: codegen compile (+ index/state builds)
    out[name] = round(min(one() for _ in range(3)), 3)
print("AB_JSON:" + json.dumps(out))
"""


def _run(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    res = subprocess.run(
        [sys.executable, "-c", _DRIVER, tree, sf_dir, *names],
        capture_output=True, text=True, timeout=3600, cwd=tree,
    )
    for line in res.stdout.splitlines():
        if line.startswith("AB_JSON:"):
            return json.loads(line[len("AB_JSON:"):])
    raise RuntimeError(
        f"A/B subprocess failed (rc={res.returncode}): "
        + (res.stderr or res.stdout)[-800:]
    )


def main() -> int:
    tree_a, tree_b, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4])
    names = sys.argv[5:]
    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    for r in range(rounds):
        # alternate which side goes first each round
        order = [("a", tree_a), ("b", tree_b)]
        if r % 2:
            order.reverse()
        for side, tree in order:
            got = _run(tree, sf_dir, names)
            for q, t in got.items():
                cur = mins[side].get(q)
                mins[side][q] = t if cur is None else min(cur, t)
    payload = {
        "tree_a": tree_a,
        "tree_b": tree_b,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "a_mins": mins["a"],
        "b_mins": mins["b"],
        "b_over_a": {
            q: round(mins["b"][q] / mins["a"][q], 3)
            for q in mins["a"]
            if mins["b"].get(q)
        },
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
