#!/usr/bin/env python3
"""Standing per-round sf1 quote: build (or reuse) the sf1 corpus, bench a
named query list there with the standard anchors, and commit the floors
as a JSON artifact — the r16-verdict ask ("make the sf1 sweep a standing
per-round artifact like the sf0.1 gate").

Usage:
    python3 tools/sf1_quote.py r17 q142_html_extract q143_bpe_encode ...

Writes SF1_QUOTE_<round>.json in the repo root:
    {"round": "...", "sf1_dir": "...", "anchors": {...},
     "floors": {...}, "bench": <full bench_only payload>}

Anchors (q04/q16) ride every quote so floors are comparable across
epochs (BASELINE.md convention: cross-epoch offsets of 1.3-1.7x on
identical code are normal on this box — compare query/anchor ratios,
not raw floors).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1full")
ANCHORS = ["q04_hll_meta", "q16_req_quantile"]


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    rnd, queries = sys.argv[1], sys.argv[2:]

    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        print(f"[sf1_quote] building sf1 corpus at {SF1}", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"), SF01, SF1],
            check=True)

    only = ",".join(sorted(set(queries) | set(ANCHORS)))
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF1,
               SPARK_GRAFT_BENCH_ONLY=only)
    print(f"[sf1_quote] benching: {only}", flush=True)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, capture_output=True, text=True)
    line = None
    for ln in (out.stdout + out.stderr).splitlines():
        if ln.startswith('{"metric"'):
            line = ln
    if line is None:
        sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
        sys.exit("[sf1_quote] bench produced no metric line")
    bench = json.loads(line)

    artifact = {
        "round": rnd,
        "sf1_dir": SF1,
        "anchors": {a: bench["queries_min"].get(a) for a in ANCHORS},
        "floors": {q: bench["queries_min"].get(q) for q in queries},
        "bench": bench,
    }
    dest = os.path.join(REPO, f"SF1_QUOTE_{rnd}.json")
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"[sf1_quote] wrote {dest}")
    for q in queries:
        print(f"  {q}: {bench['queries_min'].get(q)} s")


if __name__ == "__main__":
    main()
