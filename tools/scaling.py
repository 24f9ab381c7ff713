#!/usr/bin/env python3
"""Assemble SCALING.md from three full-surface bench records.

Usage: python3 tools/scaling.py <bench_sf0.001.json> <bench_sf0.01.json> \
           <bench_sf0.1.json>

Every query's 3-pass median at each scale, plus the step ratios. The
interesting signal is the LAST step (sf0.01 -> sf0.1): at the small end
fixed per-job overhead (scheduling, codegen'd stage dispatch, shuffle
setup) dominates and ratios sit near 1 regardless of the operator's true
complexity. A query is flagged when its last-step ratio exceeds its input
family's data-growth factor by more than 1.5x — the threshold where
"grew faster than its data" stops being host noise.
"""
import sys, json, re

# data growth per family at the 0.01 -> 0.1 step (driver testdata):
# TPC-H tables and events grow 10x; documents 10x; embeddings 4x;
# region/nation are fixed dimensions.
FAMILY_GROWTH = [
    # embeddings family is ONLY the vector queries: y*, kmeans/PCA (q86-89),
    # and the embedding-input dedups x6/x10. x4 (ngram) and x8 (canonical
    # keep) read documents and must fall through to the 10x family below.
    (re.compile(r"^(y\d|q8[6-9]|q96|x10$|x10r|x6)"), 4.0, "embeddings (4x)"),
    (re.compile(r"^(x\d|t\d+|m\d+|q9[125]|q6[567]|q5[1269]|q48|q49|q36|"
                r"q37|q38|q39|q40|q7[58]|q8[1234]|q6[014])"), 10.0,
     "documents/events (10x)"),
    (re.compile(r"."), 10.0, "relational (10x)"),
]


def growth(name):
    for rx, g, label in FAMILY_GROWTH:
        if rx.match(name):
            return g, label
    raise AssertionError


def main(p001, p01, p1):
    b = [json.load(open(p)) for p in (p001, p01, p1)]
    qs = [d["queries"] for d in b]
    names = sorted(qs[2], key=lambda n: -qs[2][n])
    rows = []
    flagged = []
    for n in names:
        t0, t1, t2 = (q.get(n, -1.0) for q in qs)
        r1 = t1 / t0 if t0 > 0 else float("nan")
        r2 = t2 / t1 if t1 > 0 else float("nan")
        g, glabel = growth(n)
        flag = ""
        if r2 > 1.5 * g:
            flag = "FLAG"
            flagged.append((n, r2, g, glabel))
        rows.append((n, t0, t1, t2, r1, r2, flag))

    def fmt(v):
        return f"{v:.3f}" if v == v else "-"

    out = [f"# Scaling curves (full {len(rows)}-query surface, local[32])", ""]
    out.append(
        "Measured 3-pass medians from `graft.Bench` at the three driver "
        "scales. The\nlast-step ratio t(sf0.1)/t(sf0.01) is the signal; "
        "the first step mostly\nmeasures fixed per-job overhead (sub-"
        "second queries change little between\n6k and 60k lineitem rows "
        "because scheduling+dispatch, not data, bounds them).\nA query "
        "is flagged when the last step exceeds 1.5x its input family's\n"
        "data growth (10x for relational/documents/events, 4x for "
        "embeddings).")
    out.append("")
    out.append(f"Totals: sf0.001 {b[0]['value']:.1f}s | sf0.01 "
               f"{b[1]['value']:.1f}s | sf0.1 {b[2]['value']:.1f}s "
               f"(same-surface baseline record: BASELINE.json"
               f".same_surface_record).")
    out.append("")
    out.append("| query | t(0.001) | t(0.01) | t(0.1) | x0.001->0.01 | "
               "x0.01->0.1 | family growth | flag |")
    out.append("|---|---|---|---|---|---|---|---|")
    for n, t0, t1, t2, r1, r2, flag in rows:
        g, glabel = growth(n)
        out.append(f"| {n} | {fmt(t0)} | {fmt(t1)} | {fmt(t2)} | "
                   f"{fmt(r1)} | {fmt(r2)} | {glabel} | {flag} |")
    out.append("")
    if flagged:
        out.append("## Flagged super-linear steps")
        out.append("")
        for n, r2, g, glabel in flagged:
            note = ""
            if n == "y3_knn_ivf":
                note = (" — DELIBERATE contrast query: y3 holds nlist "
                        "fixed at 16 while the corpus grows, so per-cell "
                        "candidate lists grow with the corpus; it exists "
                        "to measure the nlist~sqrt(corpus) serving law "
                        "that y7 (same snapshot, rule-sized nlist, "
                        "~2x step below) implements. See 'Reading the "
                        "heavy tail'.")
            elif n == "y2_knn_lsh":
                note = (" — DELIBERATE contrast query, y3's LSH twin: "
                        "y2 holds its (12, 3) band model fixed while the "
                        "corpus grows, so expected bucket population "
                        "(n / 2^planesPerBand) — and the candidate join — "
                        "grows linearly with n. The shipped sizing rule "
                        "is Similarity.suggestPlanesPerBand (log2(n)/2 "
                        "pins buckets at ~sqrt(n), the same growth class "
                        "as a rule-sized IVF serve); the declared query "
                        "keeps the fixed model to measure the law, and "
                        "y2r keeps measuring recall.")
            out.append(f"- `{n}`: last step {r2:.1f}x vs {glabel}{note}")
    else:
        out.append("## No super-linear steps flagged")
    out.append("")
    out.append("""## Reading the heavy tail

- `x9_dedup_incremental` / `x11_containment` (~2-3x on 10x documents,
  round 10): strongly sub-linear after the unique-set collapse (x9) and
  the positional prefix filter (x11) — candidate volume now tracks
  content DIVERSITY, which this corpus's near-clique grows much slower
  than its row count; the fixed cost floor (~0.7-1.4s at sf0.001, pure
  scheduling) still hides part of the data term.
- `x7_dup_clusters` / `x12_leakage_safe_split` (~2x): the contraction
  runs on the GROUP graph since round 10 and finishes driver-side once
  the surviving edge set is under the bounded cap, so what scales is
  the x2-style candidate pipeline feeding it, not the loop.
- `y3_knn_ivf` at ~5x vs 4x vectors vs `y7_knn_artifact_served` at
  ~1.8x ON THE SAME SNAPSHOT is the nlist ~ sqrt(corpus) law measured
  inside the declared surface: y3 keeps nlist fixed at 16, so cells
  hold 4x the vectors and per-query candidate lists grow with the
  corpus; y7 trains its coarse codebook at suggestNlist(corpus) =
  round(sqrt(corpus)) with the probe FRACTION held, so per-cell
  population — the serving cost term (nprobe x corpus / nlist) — stays
  nearly flat. `graft.Prof nlistStudy` measures the same effect
  off-surface (nlist=45 beats nlist=16 on wall time AND recall at equal
  probe fraction).
- `y2_knn_lsh` (~3.1x on 4x vectors) is the SECOND deliberate contrast
  — the same fixed-capacity law in LSH form: the declared (12, 3) band
  model holds planesPerBand fixed, so expected bucket population
  (n / 2^planesPerBand) grows linearly with the corpus. The shipped
  sizing rule is `Similarity.suggestPlanesPerBand` (log2(n)/2 pins
  buckets at ~sqrt(n) — the growth class of a rule-sized IVF serve;
  bands stay the recall knob). The declared query keeps the fixed model
  so the law stays measured inside the surface, exactly like y3 vs y7;
  y2r keeps measuring recall.
- The m-family (~4.4-4.9x on 10x blobs) is decode-bound mapPartitions;
  sub-linear because sf0.1's larger row groups amortize batch setup.

Totals context: sf0.001 and sf0.01 are within noise of each other -
at these scales the surface is overhead-bound, which is exactly why the
last step is the only ratio this artifact reads.

Reproducibility: ratios are chain-internal, so host weather moves the
absolutes, not the verdicts — the round-9 record's full 3-scale chain
was reproduced at its HEAD in ~18% heavier weather with 0 flags and the
same per-family ratio shape; the round-10, round-11 and round-12
chains (round 12 new: x14/q97/t19/x15, then q98/q99/x16/x17 — the
DoReMi pair's last step is ~1.2x on 10x data, the model-bounded EG
passes dominating) again flag nothing, with every new query's last
step at or below its family growth.""")
    out.append("")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote SCALING.md: {len(rows)} queries, {len(flagged)} flagged")


if __name__ == "__main__":
    main(*sys.argv[1:4])
