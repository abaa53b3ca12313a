"""r15 text_langid Arrow kernel: the factorize + np.isin + reduceat
counting pass must reproduce EXACTLY the rows of the retired
interpreted aggregate() fold — exact integer scores, same
predicted_lang under the deterministic tie-preference chain, same
is_correct. Edge cases pinned: empty text ('' splits to ['']), marker
at string edges, repeated markers (occurrence counts, not distinct),
ties across profiles (preference order en > fr > de > es), shared
tokens across docs (factorize path), and a multi-partition split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.queries.text import _LANG_PROFILES

_DOCS = [
    (1, "en", "the value of the thing"),
    (2, "fr", "le chat et le chien"),
    (3, "de", "der hund und die katze"),
    (4, "es", "el gato y los perros"),
    (5, "en", ""),  # splits to [''] -> all-zero scores -> tie -> 'en'
    (6, "fr", "de de de"),  # 'de' is an fr AND de marker: tie fr/de -> fr
    (7, "en", "a a a a"),
    (8, "de", "xyz qrs tuv"),  # zero everywhere -> 'en' by preference
    (9, "es", "the le der el"),  # 1 each -> 'en' by preference
]


def _fold_rows(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    toks = F.split("text", " ")

    def _hit(x, prof):
        return x.isin(*prof).cast("int")

    acc0 = F.struct(
        F.lit(0).alias("en"), F.lit(0).alias("fr"),
        F.lit(0).alias("de"), F.lit(0).alias("es"),
    )
    folded = F.aggregate(
        toks,
        acc0,
        lambda a, x: F.struct(
            (a.getField("en") + _hit(x, _LANG_PROFILES["en"])).alias("en"),
            (a.getField("fr") + _hit(x, _LANG_PROFILES["fr"])).alias("fr"),
            (a.getField("de") + _hit(x, _LANG_PROFILES["de"])).alias("de"),
            (a.getField("es") + _hit(x, _LANG_PROFILES["es"])).alias("es"),
        ),
    )
    d = docs.withColumn("__s", folded)
    s_en, s_fr = F.col("__s.en"), F.col("__s.fr")
    s_de, s_es = F.col("__s.de"), F.col("__s.es")
    pred = (
        F.when((s_en >= s_fr) & (s_en >= s_de) & (s_en >= s_es), "en")
        .when((s_fr >= s_de) & (s_fr >= s_es), "fr")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    out = d.select(
        "doc_id", s_en.alias("s_en"), s_fr.alias("s_fr"),
        s_de.alias("s_de"), s_es.alias("s_es"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    ).collect()
    return sorted(tuple(r) for r in out)


def test_langid_kernel_matches_fold_on_edge_docs(spark, tmp_path):
    import sdg_data_catalog_spark.queries.text as T

    docs = spark.createDataFrame(
        _DOCS, "doc_id long, lang string, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        tuple(r) for r in T.text_langid(spark, str(tmp_path)).collect()
    )
    assert got == _fold_rows(spark, _DOCS)


def test_langid_kernel_multi_partition_corpus(spark, sf_dir, tmp_path):
    import sdg_data_catalog_spark.queries.text as T

    rows = [
        (r.doc_id, r.lang, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .limit(400)
        .collect()
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(7).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        tuple(r) for r in T.text_langid(spark, str(tmp_path)).collect()
    )
    assert got == _fold_rows(spark, rows) and len(got) == 400
