"""Corpus-scaling smoke: run the map/band-heavy corpus operators at
1× and 10× the sf0.1 documents/embeddings tables and report wall
times — the empirical check behind SCALE.md's linear-scaling claims.

Clones are doc_id/vec_id-offset AND text-salted (a per-copy token
appended) so pair-mining ops don't see artificial exact duplicates
across copies; the salt token is appended, leaving the original
5-gram/shingle structure intact.

Usage: python scripts/scale_smoke.py [copies]   (default 10)
Writes nothing to the repo; scratch data lands in a temp dir.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_homeserver_spark.registry import all_queries  # noqa: E402
from lakehouse_homeserver_spark.session import get_spark  # noqa: E402
from lakehouse_homeserver_spark.sources import load_table  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
OPS = [
    "k1_dedup_exact_groups",
    "k2_simhash",
    "k2_minhash_lsh",
    "k4_repetition_filter",
    "k4_fingerprint",
    "k6_hash_split",
    "k8_decontaminate",
    "k3_knn_bruteforce",
    "k4_unigram_lm_score",
    "k3_pq_quantize",
    "k6_temperature_resample",
    # round-2 additions: classifier/BPE/sketch/fuzzy families
    "k4_hashed_classifier",
    "k4_bpe_token_count",
    "d14_heavy_hitters",
    "d15_count_min",
    "c9_fuzzy_join",
    "k7_incremental_dedup",
    # round-2 continued: retrieval / exact all-pairs / image hash
    "k10_bm25",
    "k10_inverted_index",
    "k2_ppjoin",
    "k5_ahash_near_dup",
    "k4_bigram_lm_score",
    "k4_gopher_rules",
    # round-3 additions: clustering / bloom decon / substring dedup /
    # alternating connected components
    "k3_kmeans",
    "k8_bloom_decontaminate",
    "k1_substr_dedup",
    "k9_cc_bigstar",
    # round-5 additions (VERDICT r4 #8): the r4-landed families plus
    # the r5-reworked SemDeDup (bounded trained codebook — the brief's
    # done-criterion is a <=2x ratio here) and one ACID commit-path op
    # (events/orders clones are scaled too, see build_scaled).
    "k9_pagerank_dupgraph",
    "ts_pattern_match",
    "k3_semdedup",
    "a12_time_travel",
    "k10_hybrid_rrf",
    # round-6 additions (VERDICT r5 #6): the r5/r6-landed certs.
    # i11/i12 read the 10x events clone (streaming dedup state /
    # sessionization state at 10x key volume); c12 rebuilds its
    # bucketed orders+lineitem tables from the 10x clones (does the
    # one-file-per-bucket write hold?); a51/a52/a56 run on
    # SF-INVARIANT fixtures (nation/region), so their ~1x ratios
    # certify that lifecycle/catalog overhead is corpus-independent,
    # not that data scaled.
    "i11_stream_dedup",
    "i12_stateful_session_timeout",
    "c12_sortfree_bucketed_join",
    "a51_ingest_lifecycle",
    "a52_catalog_persistence",
    "a56_catalog_resolved_scan",
    # round-7 additions: ops whose scale posture changed this round —
    # cohort retention lost its forced per-user broadcast (AQE
    # decides now; does the 10x clone still plan sanely?) and
    # temperature resample localCheckpoints its inventory (the rate
    # chain must be corpus-free at 10x).
    "ts_cohort_retention",
    "k6_temperature_resample",
    # round-8 additions: the WAP commit path at 10x customers (clone/
    # audit/cherry-pick cost must track the staged slice, not the
    # table), the leakage-free split (documents-scaled; its group
    # hashing must stay map-only), and gap-fill over 10x events (the
    # per-user grid explode is the volume risk).
    "a22_wap_publish",
    "k6_leakage_free_split",
    "ts_gap_fill",
    # round-10 addition: the real PNG codec round trip at 10x docs —
    # encode+decode are chained map-only mapInPandas passes, so the
    # ratio must track the corpus (zlib+unfilter cost is per-image,
    # no shuffle anywhere).
    "k5_png_decode",
    # round-11 additions: the baseline-JPEG round trip (same map-only
    # shape, heavier per-image kernel — Huffman+IDCT in Python), the
    # real resize chain, the HTML extraction pass (pure JVM regex/HOF,
    # must scan-scale), and the mixed-format near-dup (output-volume
    # bound: JPEG quadrant hashes live in a 2^16 space, so pair counts
    # grow ~quadratically — per-pair cost is the honest unit).
    "k5_jpeg_decode",
    "k5_resize_real",
    "k4_html_extract",
    "k5_media_near_dup",
    # late-r11: the extract->gate composition (must stay scan-bound —
    # one fused map-only pass) and the MJPEG sampler (6-frame encode,
    # 3-frame decode per clip, executor-side fan-out).
    "k4_html_quality_pipeline",
    "k5_mjpeg_frames",
    # late-r11 wave 2: the WARC container walk (gzip member split +
    # WARC/HTTP parse — the synthesis groupBy is SF-linear in record
    # count, the parse map-only), the container->extract->gate chain,
    # and the BMP / A-law codec certificates (both map-only
    # constant-per-byte kernels; must scan-scale like PNG/mu-law).
    "k4_warc_parse",
    "k4_cc_pipeline",
    "k5_bmp_decode",
    "k5_alaw_decode",
    # late-r11 wave 3: the GIF/LZW round trip (map-only; LZW is
    # linear-time per image, so it must scan-scale like the others)
    # and the WebDataset shard round trip (synthesis groupBy is
    # SF-linear in pair count; parse+decode map-only per shard).
    "k5_gif_decode",
    "k5_webdataset_shard",
    # late-r11 wave 4: container-driven G.711 dispatch (map-only;
    # per-byte bit formula after the RIFF walk) and Unicode NFC
    # normalization (vectorized pandas UDF, scan-bound).
    "k5_wav_g711_decode",
    "k4_unicode_nfc",
]


def build_scaled(spark, out_dir: str, copies: int) -> None:
    docs = load_table(spark, BASE_SF, "documents")
    embs = load_table(spark, BASE_SF, "embeddings")
    d_parts = []
    e_parts = []
    for i in range(copies):
        off = i * 1_000_000
        d = docs.withColumn("doc_id", F.col("doc_id") + off)
        if i > 0:  # salt clone text so copies are near-, not exact, dups
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytok{i}"))
            )
        d_parts.append(d)
        e_parts.append(embs.withColumn("vec_id", F.col("vec_id") + off))
    parts0 = d_parts[0]
    for p in d_parts[1:]:
        parts0 = parts0.unionByName(p)
    parts0.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e0 = e_parts[0]
    for p in e_parts[1:]:
        e0 = e0.unionByName(p)
    e0.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    # events/orders scale too (r5): ts_* ops read events and the ACID
    # commit-path ops read orders — without cloning these, their 10×
    # "ratio" would measure an unscaled input. user_id/o_orderkey
    # offsets are multiples of 10 and of the demo-slice moduli where
    # it matters (%10 filters), so per-copy row volumes stay ~equal.
    events = load_table(spark, BASE_SF, "events")
    orders = load_table(spark, BASE_SF, "orders")
    # lineitem scales with orders (r6: c12 joins the two bucketed) —
    # the SAME o_orderkey offset per copy keeps join keys aligned, so
    # cloned orders still find their lineitems.
    lineitem = load_table(spark, BASE_SF, "lineitem")
    ev_parts = []
    o_parts = []
    l_parts = []
    for i in range(copies):
        off = i * 10_000_000
        ev_parts.append(
            events.withColumn("event_id", F.col("event_id") + off)
            .withColumn("user_id", F.col("user_id") + off)
        )
        o_parts.append(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + off)
        )
        l_parts.append(
            lineitem.withColumn("l_orderkey", F.col("l_orderkey") + off)
        )
    ev0 = ev_parts[0]
    for p in ev_parts[1:]:
        ev0 = ev0.unionByName(p)
    ev0.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    o0 = o_parts[0]
    for p in o_parts[1:]:
        o0 = o0.unionByName(p)
    o0.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    l0 = l_parts[0]
    for p in l_parts[1:]:
        l0 = l0.unionByName(p)
    l0.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    # customer scales too (r8): the WAP commit-path cert (a22) stages
    # and publishes customer SLICES — without cloning, its 10× ratio
    # measured an unscaled input. The offset is a multiple of 3 so the
    # %3 slice volumes stay exactly equal per copy. (Cloned customers
    # are never referenced by orders — the ops that read customer at
    # 10× are slice/volume-bound, not FK joins.)
    customer = load_table(spark, BASE_SF, "customer")
    c_parts = [
        customer.withColumn("c_custkey", F.col("c_custkey") + i * 9_999_999)
        for i in range(copies)
    ]
    c0 = c_parts[0]
    for p in c_parts[1:]:
        c0 = c0.unionByName(p)
    c0.write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
    for t in TABLES:
        if t in (
            "documents",
            "embeddings",
            "events",
            "orders",
            "lineitem",
            "customer",
        ):
            continue
        load_table(spark, BASE_SF, t).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


# Output-volume-bound ops (VERDICT r6 next-round #7): their wall-time
# ratio at 10x legitimately exceeds 10 because the OUTPUT (near-dup
# pairs / component rows on a 68x-edge graph) grows superlinearly with
# the corpus — so the scaling fact worth asserting is cost PER EMITTED
# ROW, not total time. The smoke FAILS if per-unit cost at 10x exceeds
# UNIT_TOL x the 1x per-unit cost: a real superlinearity can no longer
# hide behind the "it's just output volume" prose explanation.
# Timings for these use best-of-3 (min is the least-noise wall-clock
# estimator on a co-tenant box; SCALE.md quiet-box protocol).
UNIT_OPS = {
    "k5_ahash_near_dup",
    "k9_cc_bigstar",
    "k6_leakage_free_split",
    # r9: ppjoin's wall-clock swings 2-4x across rounds (10.2 -> 21-26
    # -> 10.5 s at 10x this round alone) and every round explains it
    # with the same prose ("tracks true-pair volume"); per-PAIR cost
    # makes that claim mechanical the way it already is for ahash/cc.
    "k2_ppjoin",
    # r11: the mixed PNG/JPEG corpus near-dup — JPEG docs hash into a
    # 2^16-structured space (16 quadrant bits x4 replication), so
    # true-pair volume grows ~quadratically with corpus size; total
    # wall time legitimately exceeds 10x while per-pair cost must not.
    "k5_media_near_dup",
}
UNIT_TOL = float(os.environ.get("SPARK_GRAFT_SMOKE_UNIT_TOL", "1.5"))


def _unit_count(name: str, spark, sf_dir: str) -> int:
    """The WORK unit an output-bound op is linear in. Default: its own
    output rows. k6_leakage_free_split emits one row per DOC but its
    cost is the verified near-dup PAIR volume feeding the CC (the
    clone salting makes copies mutual near-dups, so pairs grow
    quadratically in copies — 147.8k -> 10.04M, 68x, at 10 copies);
    asserting per-doc cost would flag legitimate edge growth."""
    if name == "k6_leakage_free_split":
        from lakehouse_homeserver_spark.operators.dedup import verified_pairs

        return verified_pairs(spark, sf_dir).count()
    return all_queries()[name](spark, sf_dir).count()


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_SMOKE_SCALED_DIR reuses an already-built clone dir —
    # the quiet-box protocol (SCALE.md): re-measure an in-sequence
    # outlier in a FRESH PROCESS without paying the clone build:
    #   SPARK_GRAFT_SMOKE_SCALED_DIR=<dir> \
    #   SPARK_GRAFT_SMOKE_OPS=<op> python scripts/scale_smoke.py
    # (the full run prints its scaled dir for exactly this reuse).
    scaled = os.environ.get("SPARK_GRAFT_SMOKE_SCALED_DIR")
    if scaled and os.path.isdir(os.path.join(scaled, "documents.parquet")):
        print(f"reusing scaled clones at {scaled}")
    else:
        scaled = tempfile.mkdtemp(prefix="lakehouse-scratch-sf-scaled-")
        build_scaled(spark, scaled, copies)
        print(f"scaled clones at {scaled} (reusable via SPARK_GRAFT_SMOKE_SCALED_DIR)")
    qs = all_queries()
    # SPARK_GRAFT_SMOKE_OPS=a,b,c re-measures a subset without paying
    # for the full sweep (the clone build is shared either way).
    only = os.environ.get("SPARK_GRAFT_SMOKE_OPS")
    ops = [o for o in only.split(",") if o] if only else OPS
    failures = []
    print(f"{'op':28s} {'1x_s':>8s} {'%d x_s' % copies:>8s} {'ratio':>6s}")
    for name in ops:
        times = []
        rows = []
        for sf_dir in (BASE_SF, scaled):
            reps = 3 if name in UNIT_OPS else 1
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times.append(best)
            if name in UNIT_OPS:
                rows.append(_unit_count(name, spark, sf_dir))
        line = (
            f"{name:28s} {times[0]:8.2f} {times[1]:8.2f} "
            f"{times[1] / times[0]:6.1f}"
        )
        if name in UNIT_OPS:
            pu1 = times[0] / max(rows[0], 1)
            puN = times[1] / max(rows[1], 1)
            ok = puN <= UNIT_TOL * pu1
            line += (
                f"   rows {rows[0]}->{rows[1]}, per-row "
                f"{pu1 * 1e3:.3f}->{puN * 1e3:.3f} ms "
                f"({'ok' if ok else 'FAIL: superlinear per-unit cost'})"
            )
            if not ok:
                failures.append(name)
        print(line, flush=True)
    if failures:
        print(f"PER-UNIT SCALING FAILURES: {failures}")
        sys.exit(1)


if __name__ == "__main__":
    main()
