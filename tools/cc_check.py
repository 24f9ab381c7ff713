#!/usr/bin/env python3
"""Large-SF cross-check for the closure-family queries x7_dup_clusters
and x12_leakage_safe_split.

The declared DuckDB oracles for x7/x12 compute transitive closure by full
reachability — sound at the driver's sf0.01 gate, but O(sum(size^2)) rows
with an O(sum(size^3)) iteration join, which is infeasible once a corpus
has a large near-clique duplicate cluster (sf0.1 has a 3,728-doc one:
~3M verified pairs -> ~2e10 join rows per recursion step).

This script is the scalable equivalent for larger SFs: it takes the
ALREADY cross-engine-verified x2 pair output (compare.py checks x2 against
exact Jaccard in DuckDB), runs union-find with path compression over those
pairs, and

  * x7: compares the resulting min-id components against the Spark
    x7 output row-for-row;
  * x12: replays the md5 split coin (substr(md5(grp || 'x12'),1,8)
    against the 0.8/0.1/0.1 hex cut points, grp = component min-id or
    the doc's own id for singletons — byte-identical to the declared
    DuckDB oracle's CASE) over every doc_id in <sfDir>/documents.parquet
    and compares against the Spark x12 output row-for-row.

Chain of trust: x2 pairs are oracle-verified, and connected components /
per-component coins of a verified edge set need only a verified closure.

Prints bare "PASS <query>" / "FAIL <query>: ..." lines on stdout (the
shape tools/record_sf01.py ingests); detail goes to stderr.

Usage: python3 tools/cc_check.py <verifyOutDir> [<sfDir>]
       (sfDir needed for the x12 check; default /root/testdata/sf0.1)
"""
import sys, glob, hashlib
import pyarrow.parquet as pq


def load(out_dir, name, cols):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL {name}: no spark output")
    t = pq.read_table(files[0]).to_pydict()
    return list(zip(*(t[c] for c in cols)))


def components(pairs):
    parent = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for p in pairs for n in p}
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    # min-id labeling, as both the Spark ext.Clusters output and the
    # declared oracles use
    return {n: min(members) for members in comp.values() for n in members}


def check_x7(out_dir, labels):
    got = dict(load(out_dir, "x7_dup_clusters", ["id", "cluster_id"]))
    if got == labels:
        nclusters = len(set(labels.values()))
        print("PASS x7_dup_clusters")
        print(f"  x7: {len(labels)} nodes, {nclusters} clusters match "
              "union-find over verified x2 pairs", file=sys.stderr)
        return 0
    missing = {k: v for k, v in labels.items() if got.get(k) != v}
    print(f"FAIL x7_dup_clusters: {len(missing)} of {len(labels)} labels "
          f"differ; first: {sorted(missing.items())[:5]}")
    return 1


def split_coin(grp):
    h = hashlib.md5((str(grp) + "x12").encode()).hexdigest()[:8]
    if h < "cccccccd":
        return "train"
    if h < "e6666667":
        return "val"
    return "test"


def check_x12(out_dir, sf_dir, labels):
    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    want = {d: split_coin(labels.get(d, d)) for d in doc_ids}
    got = dict(load(out_dir, "x12_leakage_safe_split", ["doc_id", "split"]))
    if got == want:
        from collections import Counter
        print("PASS x12_leakage_safe_split")
        print(f"  x12: {len(want)} docs match md5-coin replay over "
              f"union-find components; split mix {dict(Counter(want.values()))}",
              file=sys.stderr)
        return 0
    diff = {k: (got.get(k), v) for k, v in want.items() if got.get(k) != v}
    print(f"FAIL x12_leakage_safe_split: {len(diff)} of {len(want)} labels "
          f"differ; first: {sorted(diff.items())[:5]}")
    return 1


def main(out_dir, sf_dir):
    pairs = load(out_dir, "x2_dedup_minhash", ["id_a", "id_b"])
    labels = components(pairs)
    rc = check_x7(out_dir, labels)
    rc |= check_x12(out_dir, sf_dir, labels)
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"))
