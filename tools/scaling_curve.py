#!/usr/bin/env python3
"""Empirical scale-curve recorder (VERDICT r6 item 2).

Runs graft.Bench on the top-cost queries + the two-phase rank primitives
at sf0.1 (the driver fixture) and at the synthetic 3x / 10x replicas
(tools/gen_scale.py), then fits the per-query scaling exponent

    t ~ c * n^alpha   =>   alpha = least-squares slope of log t vs log n

and writes SCALING_r07.json. The scale arguments in SCALING.md are
plan-shape inspections; this artifact is the measured check: the bounded
plans should sit near alpha ~ 1 (linear in corpus size). alpha is noisy
for sub-second queries -- abs_sf1 seconds matter more there.

Usage: python3 tools/scaling_curve.py [outPath]
"""
import json
import math
import subprocess
import sys

QUERIES = [
    # exact/weighted similarity joins (the bench tail) + skew hatches
    "q82_jaccard_join", "q92_jaccard_join_maxdf",
    "q93_weighted_jaccard", "q139_weighted_maxdf",
    # dedup family
    "q27_dedup_exact", "q29_lsh_near_dup",
    # shingle-heavy aggregation + substring cut
    "q123_source_novelty", "q106_substr_cut", "q187_collocations",
    "q197_memorization",
    # two-phase rank primitives (q191 stratified, q200 RRF, q203 tau)
    "q191_stratified_split", "q200_ensemble_rank", "q203_length_bias",
    # bounded-sample ANN audits
    "q32_ann_brute", "q196_hubness_audit",
    # round-7 batch: per-source two-phase rank, CDC chunking, cell-join
    # mining, source sketch matrix, Gram-matrix PC
    "q219_zipf_decay", "q222_cdc_chunks", "q223_bitext_margin",
    "q226_source_minhash_sim", "q227_top_pc",
    # round-8 batch: the join-free novelty-by-quality shape, the three
    # heaviest real-codec decode queries (image corpus is synthesized per
    # doc_id, so the documents replica scales it for free), and the
    # distributed-CC branch (driver shortcut disabled via env below)
    "q214_novelty_quality", "q182_gif_decode", "q210_image_ahash",
    "q229_image_near_dup", "q42_dedup_clusters",
    # round-9 batch (VERDICT r8 items 1/5): the >2.5s new families with
    # static plan pins but no measured curve yet -- pHash DCT decode,
    # known-item MRR eval, hybrid dense+sparse fusion, the persisted-IVF
    # build+query round trip and its incremental-upsert variant, and
    # passage retrieval (q248 shares its passageScores leaf)
    "q237_image_phash", "q238_mrr_eval", "q239_hybrid_retrieval",
    "q246_ivf_persist", "q247_passage_retrieval",
    # round-9 batch 2 (measured from round 10 on): the dense-workload
    # packed-context audit (3rd-heaviest bench entry)
    "q257_context_reuse",
    # round-10 batch 2: preference fit (corpus scan + two-phase rank into a
    # control-plane matrix), inverted-index build (THE corpus-wide postings
    # shuffle, priced once) and the pruned serve-from-storage path
    "q262_bt_strength", "q263_text_index_build",
    # round-12 (VERDICT r11 item 3): q264's single row conflated build and
    # serve (the query rebuilds the store per run) — the curve now grades
    # the two bench-only legs separately; the serve leg times ONLY the
    # bucket-pruned read + BM25 chain against a store built in its
    # (untimed) warmup pass.
    "q264_build_leg", "q264_serve_leg",
    "q265_pref_cycles",
    # round-11: text-index lifecycle — the affected-bucket upsert merge
    # (build + batch x2) and the post-compaction serving path
    "q266_text_upsert", "q269_text_compact_query",
    # round-12: the semantic-dedup grid path (exact BxB decomposition of
    # the within-label pair join)
    "q109_semantic_dedup",
]

# presentation names for the artifact (VERDICT r11 item 3 asked for
# q264@build / q264@serve rows)
RENAME = {
    "q264_build_leg": "q264_text_index_query@build",
    "q264_serve_leg": "q264_text_index_query@serve",
}

SCALES = [
    ("/root/testdata/sf0.1", 1.0),
    ("/root/repo/scaledata/sf03", 3.0),
    ("/root/repo/scaledata/sf1", 10.0),
]

# Round-11 (VERDICT r10 item 4): sqrt-labels is now the PRIMARY geometry
# for the IVF-store families. The linear replica grows the LABEL space
# K x, which grows the IVF coarse quantizer linearly -- a fixture
# artifact; a real IVF retune grows nlist ~ sqrt(n) (gen_scale.py
# --sqrt-labels). These queries' headline rows are measured on the
# sqrt replicas; ONE linear row (q250@linear_labels) stays as the
# documented artifact.
SQRT_QUERIES = [
    "q250_ivf_upsert_query", "q258_ivf_delete_query", "q259_ivf_compact_query",
]
LINEAR_ARTIFACT = ["q250_ivf_upsert_query"]
SQRT_SCALES = [
    ("/root/testdata/sf0.1", 1.0),
    ("/root/repo/scaledata/sf03s", 3.0),
    ("/root/repo/scaledata/sf1s", 10.0),
]


def run_bench(sf_dir: str, queries=None) -> dict:
    env = {"SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_ONLY": ",".join(queries or QUERIES),
           # force q42 onto the distributed pointer-jumping branch at every
           # scale so the curve measures THAT path, not the driver shortcut
           "SPARK_GRAFT_CC_DRIVER_LIMIT": "0"}
    import os
    full_env = dict(os.environ, **env)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=full_env, cwd="/root/repo")
    for line in out.stdout.splitlines():
        if line.strip().startswith('{"metric"'):
            return json.loads(line.strip())
        if '{"metric"' in line:
            return json.loads(line[line.index('{"metric"'):])
    raise SystemExit(f"no bench JSON for {sf_dir}:\n{out.stdout[-2000:]}")


def fit(runs, queries, suffix=""):
    result = {}
    xs = [math.log(f) for f, _, _ in runs]
    for q in queries:
        ts = [qs.get(q) for _, qs, _ in runs]
        key = q + suffix
        if any(t is None or t <= 0 for t in ts):
            result[key] = {"error": "missing timing"}
            continue
        ys = [math.log(t) for t in ts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
        result[key] = {
            "sec_at": {f"{f:g}x": round(t, 3) for (f, _, _), t in zip(runs, ts)},
            "exponent": round(alpha, 3),
        }
    return result


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r08.json"
    runs = []
    for sf_dir, factor in SCALES:
        r = run_bench(sf_dir)
        print(f"{sf_dir}: total {r['value']:.1f}s", flush=True)
        runs.append((factor, r["queries"], r.get("failed", "[]")))
    result = fit(runs, QUERIES)
    sqrt_runs = []
    for sf_dir, factor in SQRT_SCALES:
        r = run_bench(sf_dir, SQRT_QUERIES)
        print(f"{sf_dir} (sqrt-labels): total {r['value']:.1f}s", flush=True)
        sqrt_runs.append((factor, r["queries"], r.get("failed", "[]")))
    # PRIMARY rows for the IVF-store families: the sqrt-labels geometry
    result.update(fit(sqrt_runs, SQRT_QUERIES))
    lin_runs = []
    for sf_dir, factor in SCALES:
        r = run_bench(sf_dir, LINEAR_ARTIFACT)
        print(f"{sf_dir} (linear-labels artifact): total {r['value']:.1f}s",
              flush=True)
        lin_runs.append((factor, r["queries"], r.get("failed", "[]")))
    result.update(fit(lin_runs, LINEAR_ARTIFACT, suffix="@linear_labels"))
    result = {RENAME.get(q, q): v for q, v in result.items()}
    doc = {
        "method": ("graft.Bench (warmup + adaptive min-of-2 below 1s / "
                   "min-of-3 above, round 12) on sf0.1 and "
                   "its 3x/10x deterministic replicas (tools/gen_scale.py: "
                   "per-replica disjoint vocab, constant dimension "
                   "cardinality, constant per-label blocks); exponent = "
                   "least-squares slope of log t vs log n over the 3 points. "
                   "IVF-store families (q250/q258/q259) are measured on the "
                   "--sqrt-labels replicas as their PRIMARY rows (label "
                   "space grows ~sqrt(n), the real IVF-retune geometry); "
                   "the @linear_labels row keeps one linear-replica "
                   "measurement as the documented fixture artifact (the "
                   "linear replica grows the coarse quantizer linearly)"),
        "scales": {f"{f:g}x": d for d, f in SCALES},
        "sqrt_scales": {f"{f:g}x": d for d, f in SQRT_SCALES},
        "queries": result,
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps({q: v.get("exponent") for q, v in result.items()},
                     indent=2))


if __name__ == "__main__":
    main()
