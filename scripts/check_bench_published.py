"""Publish-everything enforcement (VERDICT r4 next #3).

Every bench log from round 5 on that contains a JSON result line must be
published: either its metric/value appears as a row in ``BENCH.jsonl``
(bench.py appends there mechanically via ``_emit``) or the log filename is
cited in ``BENCH.md``.  Run standalone or via tests/test_bench_published.py.

Exit 0 = all published; exit 1 prints the orphaned logs.
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENFORCED_FROM_ROUND = 5


def result_lines(log_path):
    out = []
    with open(log_path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def main():
    jsonl_path = os.path.join(REPO, "BENCH.jsonl")
    published = []
    if os.path.exists(jsonl_path):
        with open(jsonl_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    published.append(json.loads(line))
    bench_md = open(os.path.join(REPO, "BENCH.md")).read()

    orphans = []
    for log in sorted(glob.glob(os.path.join(REPO, "bench_logs", "r*",
                                             "*.log"))):
        m = re.search(r"bench_logs/r(\d+)/", log)
        if not m or int(m.group(1)) < ENFORCED_FROM_ROUND:
            continue
        name = os.path.basename(log)
        if name in bench_md:
            continue
        for res in result_lines(log):
            hit = any(p.get("metric") == res.get("metric")
                      and p.get("value") == res.get("value")
                      for p in published)
            if not hit:
                orphans.append((log, res))

    if orphans:
        print("UNPUBLISHED bench results (add a BENCH.md citation or keep "
              "the BENCH.jsonl row bench.py appended):")
        for log, res in orphans:
            print(f"  {log}: {json.dumps(res)}")
        return 1
    print("all bench logs published")
    return 0


if __name__ == "__main__":
    sys.exit(main())
