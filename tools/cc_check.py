#!/usr/bin/env python3
"""Large-SF cross-check for x7_dup_clusters (and x8_keep_canonical).

The declared DuckDB oracle for x7 computes transitive closure by full
reachability — sound at the driver's sf0.01 gate, but O(sum(size^2)) rows
with an O(sum(size^3)) iteration join, which is infeasible once a corpus
has a large near-clique duplicate cluster (sf0.1 has a 3,728-doc one).

This script is the scalable equivalent for larger SFs: it takes the
ALREADY cross-engine-verified x2 pair output (compare.py checks x2 against
exact Jaccard in DuckDB), runs union-find with path compression over those
pairs, and compares the resulting min-id components against the Spark
x7 output row-for-row. Chain of trust: x2 pairs are oracle-verified, and
connected components of a verified edge set need only a verified closure.

Usage: python3 tools/cc_check.py <verifyOutDir>
"""
import sys, glob
import pyarrow.parquet as pq


def load(out_dir, name, cols):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL: no spark output for {name}")
    t = pq.read_table(files[0]).to_pydict()
    return list(zip(*(t[c] for c in cols)))


def main(out_dir):
    pairs = load(out_dir, "x2_dedup_minhash", ["id_a", "id_b"])
    got = dict(load(out_dir, "x7_dup_clusters", ["id", "cluster_id"]))

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
    want = {n: min(members) for members in comp.values() for n in members}

    if got == want:
        print(f"PASS x7_dup_clusters: {len(want)} nodes, "
              f"{len(comp)} clusters match union-find over verified x2 pairs")
        return 0
    missing = {k: v for k, v in want.items() if got.get(k) != v}
    print(f"FAIL x7_dup_clusters: {len(missing)} of {len(want)} labels "
          f"differ; first: {sorted(missing.items())[:5]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
