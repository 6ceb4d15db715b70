"""Core-scaling probe (r16, VERDICT item 5): time the given catalog
queries at two core counts on the scale fixture, one fresh subprocess
per (cores, round) with the bench's warm-up + noop-sink + min protocol.
A compute-bound line should approach cores_hi/cores_lo speedup; a ratio
near 1 means the line is orchestration-bound at this size.

Usage:
    python tools/core_scaling_probe.py <sf_dir> <cores_lo> <cores_hi> \
        <rounds> q1 q2 ...
Emits one JSON line: per-query mins at each core count + lo/hi ratios.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_DRIVER = """\
import json, sys, time
sys.path.insert(0, %(repo)r)
from inbev_data_engineering_case_spark.queries import CATALOG
from inbev_data_engineering_case_spark.session import get_spark
sf_dir, names = sys.argv[1], sys.argv[2:]
# the sandbox JVM defaults to a 1g driver heap, which cannot hold the
# 10x fixture's AQE runtime-stats broadcasts (~64MB relations) — size
# it like a real cluster driver so the probe measures the data plane
spark = get_spark("core-scaling", extra_conf={"spark.driver.memory": "8g"})
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    def one():
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        return time.perf_counter() - t0
    one()  # untimed warm-up
    out[name] = round(min(one() for _ in range(2)), 3)
print("SCALE_JSON:" + json.dumps(out))
"""


def _run(repo: str, cores: int, sf_dir: str, names: list[str]):
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    res = subprocess.run(
        [sys.executable, "-c", _DRIVER % {"repo": repo}, sf_dir, *names],
        capture_output=True, text=True, timeout=3600, env=env, cwd=repo,
    )
    for line in res.stdout.splitlines():
        if line.startswith("SCALE_JSON:"):
            return json.loads(line[len("SCALE_JSON:"):])
    raise RuntimeError(
        f"scaling subprocess failed (rc={res.returncode}): "
        + (res.stderr or res.stdout)[-800:]
    )


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir, lo, hi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    rounds = int(sys.argv[4])
    names = sys.argv[5:]
    mins: dict[int, dict[str, float]] = {lo: {}, hi: {}}
    for r in range(rounds):
        order = [lo, hi] if r % 2 == 0 else [hi, lo]
        for cores in order:
            got = _run(repo, cores, sf_dir, names)
            for q, t in got.items():
                cur = mins[cores].get(q)
                mins[cores][q] = t if cur is None else min(cur, t)
    payload = {
        "sf_dir": sf_dir,
        "cores_lo": lo,
        "cores_hi": hi,
        "rounds": rounds,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "mins_lo": mins[lo],
        "mins_hi": mins[hi],
        "lo_over_hi": {
            q: round(mins[lo][q] / mins[hi][q], 3)
            for q in mins[hi]
            if mins[lo].get(q)
        },
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
