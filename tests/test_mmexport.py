"""Composition facts for k7_multimodal_export (VERDICT r11 #6)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_homeserver_spark.operators.dedup import norm_text
from lakehouse_homeserver_spark.operators.mmexport import (
    k7_multimodal_export,
)
from lakehouse_homeserver_spark.operators.text import gopher_gate
from lakehouse_homeserver_spark.sources import load_table as T


def test_export_packs_exactly_the_gated_survivors(spark, sf_dir):
    out = k7_multimodal_export(spark, sf_dir).toPandas()

    # independent recomputation of the survivor set
    d = T(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = Window.partitionBy(
        F.md5(norm_text(F.col("text")))
    ).orderBy("doc_id")
    deduped = (
        d.select("doc_id", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    gated = gopher_gate(deduped).filter(F.col("keep"))
    expect = {
        r["doc_id"]: r["text"]
        for r in deduped.join(gated.select("doc_id"), "doc_id").collect()
    }
    assert set(out["doc_id"]) == set(expect)

    # parse-back digests really are the plaintext md5 (lossless pack)
    for doc_id, dig, n in zip(
        out["doc_id"], out["txt_digest"], out["txt_chars"]
    ):
        assert dig == hashlib.md5(expect[doc_id].encode()).hexdigest()
        assert n == len(expect[doc_id])

    # pairing order: sample_index contiguous from 0 within each shard
    for _sid, grp in out.groupby("shard_id"):
        idx = sorted(grp["sample_index"])
        assert idx == list(range(len(idx)))
        # and ordered by doc_id (the _wds_assemble contract)
        assert list(grp.sort_values("sample_index")["doc_id"]) == sorted(
            grp["doc_id"]
        )
