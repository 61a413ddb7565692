"""Multimodal plumbing + ANN recall tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from service_level_reporting_spark.operators import multimodal as MM
from service_level_reporting_spark.operators import similarity as SIM
from service_level_reporting_spark.tables import load_tables

from .conftest import SF_DIR_001


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG....")


def test_decode_fake_is_deterministic():
    a = MM.decode_image(b"hello world payload", fake=True)
    b = MM.decode_image(b"hello world payload", fake=True)
    assert a == b
    assert set(a) == {"width", "height", "mean_intensity"}


def test_feature_extraction_roundtrip(spark):
    docs = load_tables(spark, SF_DIR_001, ("documents",))["documents"]
    feats = MM.extract_features(MM.assets_from_documents(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    # n_bytes must equal the utf8 length of the source text (plumbing intact)
    lens = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    for r in rows[:50]:
        assert r["n_bytes"] == lens[r["asset_id"]]
        assert len(r["header_hex"]) == 16


def test_ann_lsh_pairs_have_exact_cosines(spark):
    """Every pair the ANN path returns must carry the TRUE cosine (bucketing
    may lose recall, it must never corrupt similarity values)."""
    ann = SIM.similarity_ann_lsh(spark, SF_DIR_001).collect()
    assert ann, "ANN returned nothing"
    exact = {(r["vec_a"], r["vec_b"]): r["cos_sim"]
             for r in SIM.similarity_topk_pairs(spark, SF_DIR_001)
             .unionByName(SIM.dedup_embedding_cosine(spark, SF_DIR_001)).collect()}
    e = load_tables(spark, SF_DIR_001, ("embeddings",))["embeddings"]
    # recompute exact cosine for the ANN pairs directly
    from service_level_reporting_spark import functions as SF
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    ann_df = spark.createDataFrame([(r["vec_a"], r["vec_b"], r["cos_sim"]) for r in ann],
                                   "vec_a long, vec_b long, cos_sim double")
    joined = (ann_df.join(a, "vec_a").join(b, "vec_b")
              .select("vec_a", "vec_b", "cos_sim",
                      F.round(SF.cosine("ea", "eb"), 6).alias("true_cos")))
    for r in joined.collect():
        assert r["cos_sim"] == r["true_cos"], r
