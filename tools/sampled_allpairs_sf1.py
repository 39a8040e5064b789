#!/usr/bin/env python3
"""Plan-INDEPENDENT spot check of dedup_prefix_jaccard at sf1.0
(r12 advice item 2).

The sf1.0 hash-verification of dedup_prefix_jaccard runs through an
oracle TWIN that replays the same rarest-first prefix-filter candidate
step as the plan under test (ScaleProbe.Sf1OracleTwins) — sound by the
PPJoin theorem and proven equal to the all-pairs form at sf0.01/sf0.1,
but no longer plan-independent for candidate generation AT sf1.0: a
shared algorithmic bug in the prefix formula would pass both sides.

This check restores independence at the verified scale on a sample:
take a deterministic ~2k-doc subset of the 50k-doc replica
(doc_id % 25 == 0 — uniform across the 10 key-shifted replicas), run
the ORIGINAL quadratic all-pairs oracle (the driver's sf0.01 form,
verbatim, restricted to the subset: ~2M list_intersects, feasible),
and demand exact pair-set equality with the Spark gate output
restricted to pairs with BOTH endpoints in the subset. Subset-
restriction is sound for this gate because its output is per-PAIR with
no cross-pair aggregation: a pair (a,b) passes the 3/5-Jaccard test
based on docs a and b alone.

Usage: sampled_allpairs_sf1.py <bigDir> [<verifyDir>]
       (verifyDir defaults to <bigDir>/_verify)
"""
import json
import os
import sys

import duckdb

# Pairs survive doc-sampling at rate 1/MOD² — MOD=25 (~2k docs, ~2M
# candidate intersects, <1 min) keeps only ~4 of the 2,560 sf1.0 pairs;
# MOD=5 (~10k docs, ~5e7 intersects, ~10 min) keeps ~100. Default to
# the strong form; override with SAMPLED_ALLPAIRS_MOD for a quick look.
MOD = int(os.environ.get("SAMPLED_ALLPAIRS_MOD", "5"))


def main(big_dir, verify_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    doc = f"{big_dir}/documents.parquet"
    doc_src = f"{doc}/*.parquet" if os.path.isdir(doc) else doc
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{doc_src}' WHERE doc_id % {MOD} = 0")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]

    # The driver's all-pairs oracle, verbatim from the dumped board SQL
    # (so this file can never drift from the real oracle text).
    oracle_sql = json.load(open(f"{verify_dir}/oracle_sql.json"))
    # The dump may carry the sf1.0 twin; the all-pairs form lives in the
    # repo source of truth via Verify at small SF. Accept either file.
    allpairs = os.environ.get("ALLPAIRS_SQL_JSON")
    if allpairs:
        oracle_sql = json.load(open(allpairs))
    sql = oracle_sql["dedup_prefix_jaccard"]
    if "pfx" in sql:
        sys.exit("oracle_sql.json holds the prefix-filter TWIN, not the "
                 "all-pairs form; point ALLPAIRS_SQL_JSON at a small-SF "
                 "dump's oracle_sql.json (e.g. /tmp/verify_out)")
    expected = set(map(tuple, con.execute(sql).fetchall()))

    gate = f"{verify_dir}/dedup_prefix_jaccard"
    got = set(map(tuple, con.execute(
        f"SELECT id_a, id_b, n_inter, n_union FROM '{gate}/*.parquet' "
        f"WHERE id_a % {MOD} = 0 AND id_b % {MOD} = 0").fetchall()))

    missing = sorted(expected - got)[:5]
    extra = sorted(got - expected)[:5]
    ok = not missing and not extra
    print(json.dumps({
        "metric": "sampled_allpairs_sf1",
        "sampled_docs": n_docs,
        "pairs_allpairs": len(expected),
        "pairs_gate_restricted": len(got),
        "pass": ok,
        "missing_head": [list(m) for m in missing],
        "extra_head": [list(e) for e in extra],
    }))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    big = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"{big}/_verify"
    main(big, out)
