#!/usr/bin/env python3
"""Build the sf1 scaling corpus: every sf0.1 table duplicated 10x under
the round-12/14 perturbation protocol (BASELINE.md "full-suite sf1
sweep").

- Consistent key-domain offsets: each copy c shifts every column of a
  key domain by c * (domain_max + 1), so per-copy join structure is
  preserved exactly (orders still match their lineitems, nations their
  regions) while copies never cross-join.
- documents.text gets a per-copy lowercase-letter permutation (copy 0 is
  identity): injective token maps, identical whitespace/\\w boundaries,
  same n_chars — within-copy dup/shingle structure is exact, cross-copy
  text similarity collapses.
- embeddings.embedding gets per-copy diagonal sign flips (copy 0
  identity): within-copy cosines exact, cross-copy similarity collapses.

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf1full
"""
import hashlib
import os
import random
import string
import sys

import duckdb

DOMAINS = {
    "regionkey": [("region", "r_regionkey"), ("nation", "n_regionkey")],
    "nationkey": [("nation", "n_nationkey"), ("customer", "c_nationkey"),
                  ("supplier", "s_nationkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
COPIES = 10


def letter_perm(copy):
    """Deterministic lowercase-letter permutation for a copy (0 = identity)."""
    letters = list(string.ascii_lowercase)
    if copy == 0:
        return str.maketrans("", "")
    rnd = random.Random(int(hashlib.md5(f"copy{copy}".encode()).hexdigest()[:8], 16))
    shuffled = letters[:]
    rnd.shuffle(shuffled)
    return str.maketrans("".join(letters), "".join(shuffled))


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    offsets = {}  # (table, col) -> per-copy step
    for dom, cols in DOMAINS.items():
        step = 0
        for t, c in cols:
            m = con.sql(f"SELECT max({c}) FROM '{src}/{t}.parquet'").fetchone()[0]
            step = max(step, int(m) + 1)
        for t, c in cols:
            offsets[(t, c)] = step

    for t in TABLES:
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        parts = []
        for c in range(COPIES):
            sel = []
            for col in cols:
                step = offsets.get((t, col))
                if step is not None:
                    sel.append(f"{col} + {c * step} AS {col}")
                elif t == "documents" and col == "text" and c > 0:
                    tr = letter_perm(c)
                    frm = "".join(chr(k) for k in sorted(tr))
                    to = "".join(chr(tr[k]) for k in sorted(tr))
                    sel.append(f"translate(text, '{frm}', '{to}') AS text")
                elif t == "embeddings" and col == "embedding" and c > 0:
                    # sign flip dim i of copy c iff bit (i % 30) of the
                    # copy hash is set — deterministic, identity at c=0
                    h = int(hashlib.md5(f"emb{c}".encode()).hexdigest()[:8], 16)
                    sel.append(
                        "list_transform(embedding, (x, i) -> "
                        f"CASE WHEN (({h} >> ((i - 1) % 30)) & 1) = 1 "
                        "THEN -x ELSE x END) AS embedding")
                else:
                    sel.append(col)
            parts.append(f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
        q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
