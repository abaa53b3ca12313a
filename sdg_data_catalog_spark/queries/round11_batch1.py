"""Round-11 batch 1: partial-oracle promotions (r10 verdict #5).

Three rows-only operators gain full-oracle census twins, phash-style
(mm_phash_candidates precedent): the Spark side runs the REAL byte-level
pipeline (self-contained codecs, Arrow batches), and the DuckDB oracle
joins a finite constant table of independently computed expected outputs —
any divergence in codec roundtrip, resize arithmetic, Arrow transfer, or
hashing flips the value hash.

The constant tables are HARDCODED (not computed at import: regenerating
them costs ~2 s of pure-Python codec work, too slow to pay on every
session start) and pinned by tests/test_round11_batch1.py, which
regenerates both tables from the live codecs and asserts equality — codec
drift fails the pin test instead of silently desyncing the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import multimodal as MM
from sdg_data_catalog_spark.queries.registry import register

# (key, resized_n_bytes, resized_sha256) for key = doc_id % 64 — expected
# output of synthetic_image(key, 24) -> encode -> _resize_payload(.., 16, 16)
# for the PNG and baseline-JPEG source paths respectively. Pinned by
# tests/test_round11_batch1.py against live regeneration.
_RESIZE_PNG_CONSTANTS = (
    "(0, 611, 'ad8f7190e854f12902bc1379a18926b0a106183ec7e0b3797eccb0e28e656716'), (1, 722, '06be1ba50b1cc3ace8f577a101334565bcddd9ab881bece21d8dceb7f1ea4f8e'),"
    "(2, 718, '7f0bba0913c497f5570b3969383f9b643be47c843eb682c4251d3a5332a2ecec'), (3, 724, '76b3813dbce47441f552a76c96a67bab4ce18ad2fc9444adfed806d2c3e0bf44'),"
    "(4, 718, '7d5c7e8ab2cd600bcc673b771b0a1672a20f585fcc74592eafa9de663eb34fd1'), (5, 729, '56f2d9d6a524e26f926beb03c6c72442f4bc0cd59382d160c7e0769f63ba5bf9'),"
    "(6, 695, '0f91d8c6977cd8d6398643d1e676e1915fc25a2c97b8843501253c423d7b480f'), (7, 702, '12af42c5271059aeed6ca0c80d9644e45d90e57c7f29c51377fa5b470f6a729f'),"
    "(8, 711, '63b37ecee43f349178b5a19ff200676e9735b5e707f8d827de0746c7f5931667'), (9, 668, '3a789b37c9ef9b60c7802979d2fad66cf14af2df3b1e22eb01d6ef0a21cbc0c5'),"
    "(10, 727, '644fefd470926e15bd9e1079cb1284835fa89b370194077b88f20e8ffefd43e7'), (11, 709, '485f8f4ab214de7122c77f01f79e6ce58981036140636b77863f3104f176e376'),"
    "(12, 724, 'bdfbd06817ed7beefcd151a406c2b8c85204c745541ca1b09994f409ef89a251'), (13, 725, '4f4b3b1d52b4addae6e72580ef4d0a88a625b2db8fe0976d69380afb2ef2fb02'),"
    "(14, 732, '0cd3865e8ab9fdbf4d01a55eea7602f384fba2e5bf4cf4fe7e4e6ceb43fc935f'), (15, 686, '48a2dd805431cae4787383ab11ca5172dccacb0f113b279de322d21048135854'),"
    "(16, 690, '3ef58aa1f8e264f3efdc2d2c7c3964da6a9d907a0a7fc6276184363ba5665e97'), (17, 720, 'dab162459dbbcac8ffd0166e82a33d1803526a1d94599aa4a92134dc8417359d'),"
    "(18, 703, '2e962795a33cf63e8f9597264a7798b1c92a69f0bd04684834a2399451800a0a'), (19, 734, '05cdddab1558d295eaba760f3bdf398f34b43041e03230f5d90f26fc7fe3d150'),"
    "(20, 704, '9899dae35d890b26b66909c31b7e469cca51323f6e3b374caa26665c20f233e4'), (21, 722, '63846c2d2a0defd9ccc0ea8520ece850dccc99a598686f6252a4a8ed331df428'),"
    "(22, 705, 'fe43cb5bb561c7e8fbc5e929aa60c871da514ca77e85bf6de65ad04bf8b349dd'), (23, 715, '15541f47a02aa3ac5c3176cac7ace76c38cb6138ce488c4c6c500db7a017660b'),"
    "(24, 683, 'fe2b7acfe3a007eb2ba67ebe41542e646701aced23a3e9aea83b3394df6779b9'), (25, 710, '4ab40ca30083b6bd1dbb3eb85b88d59a7f621edd40d4a135e6315c7682a68392'),"
    "(26, 716, '8a57618d5e7c5a89758c6b041c4156c9a0f5a2761447e055b39ee11947d2b4ec'), (27, 689, '3f28ca5d69e587915efc8b2175b25a74d2a16dca7ff5106595f7cdc508593696'),"
    "(28, 734, '47aedc7eee8c89b5044a4b2713ea82ddd4e1e52799a4ec6ba1b8526ecb484de8'), (29, 723, 'e34c7d3401389096f515e2649128126af10616d245504a92d7f2e8a9bc2649ab'),"
    "(30, 731, '0b4002a5ea41f9907238ba06004cab1e8197f9611fa1c27b2aee3d5c8cff9590'), (31, 676, 'eb586731e4347b052f380172cff7f78d39b856be4b4f3fc53cea765aac012e6b'),"
    "(32, 699, 'b4fb103b0c9cb3ad04b77ad21da1c9358dc848d9054b0b56f3bbaf82af08ec2a'), (33, 683, 'aa7b665a7a2cb09780c6126b214e421a24de28d5c67aba02b1997d70d9fb9f30'),"
    "(34, 734, 'cb6bd0460c434adc309f0973e9a31d9115a9ff4b2dae1edc0b3d90a446c1d51a'), (35, 714, 'd1471b563e9f5cfc287185c2797175ba1c50513e2f90afdf68cd233732865196'),"
    "(36, 722, '22438d6004a23c126e32f79336f09f10d51f6b1b8c071f61c0f81f32135cc8ba'), (37, 732, 'c30db29cf16aaad1c1d0df5609bc34a700e2c1927942f4005064912c210ba64c'),"
    "(38, 726, '0e4a3bf59d50c4ac4bb75d466d22b9ab7f74c2d3d647de25eef9e5ef056ae3c7'), (39, 712, '0196818edcd18b0b85024f9d8ee3860da4a1d803b6711787362425245182d223'),"
    "(40, 692, 'cd5e3a0ccdba164066ae977dd95fa3fbbc8e2ac36c20902a460f1f2885944afa'), (41, 714, 'c6a664961a628ebb9f5e9cf28c9c5bbdac05f913d7b084282f4538fda0033557'),"
    "(42, 692, 'e1b5548d516ca73d9c85da9267f5fc9013b27b442f68fe9f2b8eed151eb1ff1c'), (43, 732, '5301e4b516311c9271c9a54698ec9ee9395fb04793f2ce249d78c7317eb3d3fe'),"
    "(44, 719, '7bbf90559374ba3779e4dee9e1e5f6dc33a478467195b594a9493fbf0ef30ac5'), (45, 724, 'a14edd20687596814a2e6d213ff4260d1b3848c2f6c13d2bdcaddc28911a640b'),"
    "(46, 716, '7954e443daea6d36705f6fb31bc7df882d47b945b3d431b85c67868164f264ff'), (47, 716, '3dd8bd724c23b4624648b7b31502491984d68a89aae942d866001190704915b0'),"
    "(48, 693, 'e63edb98a7a0ae68b5b4c24b26d7f575409857b07516f9760b2bf1c43c776f8f'), (49, 717, '1a419a69385b48c482da572d491a01cca0aa8dc712af389a58db7edef7e14823'),"
    "(50, 729, 'c7f878b949aa243a4c06a7cd73a0ccf3b823dd8f8102a1fb431d6454f174c685'), (51, 700, '09203029d34e63a885a019e986f0303e021238c5a88535cadf78f4611010192f'),"
    "(52, 731, 'c3710aa0f6d023c2c4d39775c4c5a2e4503114631e01c3a58a432cc1901b0713'), (53, 719, '520e6d2268852accc99228b9a828b6403d2824289e86fedda9fb4f2c46da0eed'),"
    "(54, 722, '20f238518bfddc3579ea39eb224d70d31c9693c810f355daa51f794bdb64df31'), (55, 687, 'e0e36d4206e86ba0974c815d9324e6eba45954aed402818d6735f2baba8205df'),"
    "(56, 710, '91c6385c990c91285d713b08e669de91477cdbd731fb85ffedf2c39366d26842'), (57, 699, '858fee8c44ecc97d62840bae405de09ed03dd7808eccfe42ddc0aa3a9d673647'),"
    "(58, 726, 'da77c54da955c461d50cc836bcc58f734ce9471bf9b9499e8bee313a55b8d1f2'), (59, 730, '822230558894b07c65d2fc049a4097f68429a28205ab4c8c0edb24ecbc51f0ff'),"
    "(60, 720, 'f3615f441057c2e2be88718bfd9bd26ef3826c5d2d97763ac6af4ce0985fe75c'), (61, 734, 'cf6c0801c6f0aeb0d861af63f0dcc31ef13bd6f4a3c911006fe7a3e62e81d222'),"
    "(62, 703, 'a8801963bfdb4af5aaef12d76933de8bbfe1538d2bfa6c85f175ee8b9abda7ff'), (63, 715, 'd500ad4ebdfc36f063a1fc7b7c44ffa78485e9f42f8b23a90ad5349e59d2851c')"
)

_RESIZE_JPEG_CONSTANTS = (
    "(0, 789, 'a8f3d374764d4678e68a471f82d70888fbb4be867f7d0c631c062839c0089cc3'), (1, 852, '18cb1c97f10d74ba4d0a5c0f16ae9b1d0ee44353962a97c0d12bc2ea0df32b4c'),"
    "(2, 852, '7babf69dadc67b7aedbc1b368fe462d00810ce9ae91023cc38507c85d42fbf7e'), (3, 852, 'effe83ab75a80144124bdd70612063caabbcd8b694af5faac7b481e707482704'),"
    "(4, 852, '7281f98b864b7c38b6ca9e8940d88a4c0f275a9bb4e74f2d78c3189693584c47'), (5, 852, '1580346cb418b7a91a00320036c32841d4d22887bfcb83fc5f119b40bd8983e0'),"
    "(6, 852, 'ee9efc2a5ce765d208826e3af040f024a1074286f467f972409aa6a2372b99fb'), (7, 852, 'c6f35fe2be5f14f5733f32b9c86565b214ea50b13d230db8efcfc65ee62b2828'),"
    "(8, 852, 'b99fd558944520fda56baca91920011e27674ca26fc0da8d440f454ab99d0397'), (9, 852, 'bdce0c8b9fd2dcbd7b9ed9452cee573a549db8c64cf5ec42bd544693cfedf8ba'),"
    "(10, 852, 'b28483e907f96eab8b3d95a1eb9102715811487c99b91f711aeb7b2dd2953856'), (11, 852, 'c0bd5cf0d088249688294e10847c3ac8a3ae19e0a1ef6c6d082df47bb1c029de'),"
    "(12, 852, 'ec304c09aaacbd20bcb165e058a8e80256ce6e1ff5ffed853f7227cab66a2218'), (13, 852, '7560d2b2026ca9e6a164beaa32f5d75c1d3ff10e9c28211477fa131f937fd5e2'),"
    "(14, 852, '9a1dbaa0b712675a1416dfd31062350f7701b3269b957f5af26b4473daf878cc'), (15, 852, '3fd824e7e479c86592f8514841e5348711d31543d17848f3e784a20da8051aab'),"
    "(16, 852, '29f46b388876c3577645643e7938fe7fda5aff070a44cca52a4a39ed5f67fbdc'), (17, 852, '96b89775c80b0b3e799579dc66cd9f8cb40bae51c1a656b7a875a182b5062f65'),"
    "(18, 852, 'd697ef19b3c19fcc6487896673cef8e45f152e120b949313740d3ba86370c7dc'), (19, 852, '7e83c374d57239a3199422bfe9bc68bc03568bd064605002081b57d7f571e095'),"
    "(20, 852, '7023ed6e8a7156c6aaa7dfabd22aecb0d6b99590790b9e29a02bed8cd6b7f60e'), (21, 852, '082ac4dc32049e0562627f359da6f3c1a64366b22bbd305a54191c6b2dd76173'),"
    "(22, 852, '4bec38752b410ccba18d6d746136e61129d12565b0248a70a85453a03f97ceec'), (23, 852, '3465c7b46bf892eaf996c0490f07d3e58e16b60519154f093f1ae2cd60de06e0'),"
    "(24, 852, 'f5b5f9d11d3abf321ceb5bcdf9dc95aa1ee53e615edb5e1cda1f9137036d2ee7'), (25, 852, '5482dae1628d87ec574255515e86ce18a581916d885c06fd7efba051e86a530d'),"
    "(26, 852, '6825a807e9e61d4f3b4ceafda36864898c24aca7b6555c234b6baa54c6d4e8de'), (27, 852, 'a1ff6e6aa1cbbb317f5f9ebca39d7377417bcbf218c69f4f79f41ac3440bcdb1'),"
    "(28, 852, '5ba5f66c9a571c9ca3ae117a6ccff958503c8710448fbd92c08b1b08134ea3b6'), (29, 852, 'fb22a340ef59c1d82035efdc89b1bdce547b2b42f98a8450af3b6ab58308b294'),"
    "(30, 852, 'd1c90f70f06af7803d3141e4d6419330874fdfd70975859c5b349c43a2056158'), (31, 852, 'c1ab1329e7d8b2215613df2370876bd41f9deb5b0dc9d11d895492f7b52dc606'),"
    "(32, 852, '20a185909323bd3c701c558dc46e794f906db46bbbf257fef7bf5cbcc15f2b7b'), (33, 852, 'aad2411183320020c34409c3139373692ffbff83006cc75b3e78d56797fa147e'),"
    "(34, 852, '3263208c75c4bd37f5ba80d0b805e8d86dc1a94c64cbab0974df2bc4b00f1918'), (35, 852, '5a38744c612d7536d0ef9e0ae0f4f6dd0cd0029c3abdafd2eca1dc432b3b3b86'),"
    "(36, 852, '509cf660a32c50f86cf6b0fa3a20ac1054690ff8b55cc226775451d1ec1ce6a8'), (37, 852, '78f19fa9fc67899717f04c964bf13a79f70866b12d22d5fa6a60d63836a5ad37'),"
    "(38, 852, '7049f13c664df32418e6ca721aa68a98dc7a12695e584be7678964fea9d40f9e'), (39, 852, 'bfcb413667e2438766cac0c24ccd4176fa3ac73cdbba2f1e26cff97e482bde42'),"
    "(40, 852, '6080590b0cb5d63a3cfcf455f6433af774c88e9a490aac5b9d65397b26dcc04e'), (41, 852, 'f445d95eef9a4652e88e627198dfd3cc645088a291272f8422874d43e8437fc9'),"
    "(42, 852, '7ede202d57777a87e4c384fa3631cb0dc165994f435d18bcefe02d5602859552'), (43, 852, 'bed390eab575bcfbaa4bc03707cba22321294df15e57fb6ab198a7695c2de7e6'),"
    "(44, 852, '0ecfaf51aca932bfa411a26ee15a16527aa236a81ecacb7bc90d0d766c006d4e'), (45, 852, '64d4d1ebf195cd22a76f3e454a53d0735637a85ef015cabcde69f613ed7ee44b'),"
    "(46, 852, '7e2fb7af1685077e5fe579682020fec9e6098263623e2097bbf5ef36e2918111'), (47, 852, '233408ba5fb6aa7a7b817435208c7c1278d7909cf1d4ebc19259babef8a0a25f'),"
    "(48, 852, '2471b254dd2b6cbc72a9637adffb51644299c81d7cea67d387f72c18cdf58891'), (49, 852, '1df5386feba063a14a6cc56ee676c74aa3ccc4356e5fae1b841aa5e850d66eca'),"
    "(50, 852, '116c1ce3cde22aa6d337bb039f5fc19765c2a896f27cde51fd6a68aa5ab041ba'), (51, 852, '2128ea00fe6dd10720fa044336ff37c543c80e5a3b487f2e336cc26ef4f9ec58'),"
    "(52, 852, '4222c16a2b5edddafaeac979d78c110059078b3ad3df2cc77b81252844a93421'), (53, 852, '83f6dcfab57cfa3d9e84a368ecabae210bd88b71c1168bd3e0aa65eb2387ccab'),"
    "(54, 852, '26d4e538cf474439d5f1a5d79c2dee1ee31de001144f02239134b9d661405bdb'), (55, 852, '4ee0d7061e5ff84ff79d059b295a633a80c8b09c0883c531807a75043ca16682'),"
    "(56, 852, '3b21c81cff86c8b9463efec36fdaaaf5b3394f86ed836e4041ea7f5d2f6b224a'), (57, 852, '999e870ff7e7ae75225275bb5a53e8ea87b03d9073c14305335efb3082971be6'),"
    "(58, 852, '5d6681eddba2eda8b08e2c7877323635d8a60f115de2419e3778476532e0ed8e'), (59, 852, 'b8682e45bb4b31919483eff992e90c5d83e2c17a3d088deceaf8ec3d98ad070e'),"
    "(60, 852, '36e65d85a93640e4836863bd81c8f27004081ee3cbdc96a362a15cf4a7b2fbbd'), (61, 852, 'be4a2a4e3ed9bece38259f6c817c23d5a522a57112e9bca4929a69b8720a76a7'),"
    "(62, 852, 'ddca7aa879803c5db43ac19b4e7b3e432013af9ab07d6fe5a18afe98d8482cd4'), (63, 852, 'd39159d2555eacae69e1a824b55419cf27f4e8461ca3fc9dd6f3c6b401576802')"
)


@register(
    "mm_resize_census",
    oracle=f"""
    WITH exp(k, n_bytes, sha) AS (VALUES {"".join(_RESIZE_PNG_CONSTANTS)})
    SELECT d.doc_id AS media_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(exp.n_bytes AS BIGINT) AS n_bytes,
           exp.sha AS sha
    FROM documents d JOIN exp ON exp.k = d.doc_id % 64
    """,
)
def mm_resize_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-oracle twin of mm_resize (promoted from rows-only, r10 verdict
    #5): corpus-wide PNG decode -> nearest-neighbor resize to 16x16 ->
    re-encode inside Arrow batches (operators/imagecodec.py, stdlib-zlib
    only, environment-independent bytes), with the image universe bounded
    to doc_id % 64 so the oracle joins the 64-row expected table above.
    The value hash covers the output payload's exact size and sha256 per
    document — the whole binary-column plumbing end to end. Scale shape:
    rows grow linearly with the corpus, per-row work is constant, no
    shuffle (map-only plan)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_png_media(docs, key_mod=64)
    resized = MM.resize_media(media, 16, 16)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


@register(
    "mm_resize_jpeg_census",
    oracle=f"""
    WITH exp(k, n_bytes, sha) AS (VALUES {"".join(_RESIZE_JPEG_CONSTANTS)})
    SELECT d.doc_id AS media_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(exp.n_bytes AS BIGINT) AS n_bytes,
           exp.sha AS sha
    FROM documents d JOIN exp ON exp.k = d.doc_id % 64
    WHERE d.doc_id % 3 = 0
    """,
)
def mm_resize_jpeg_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-oracle twin of mm_resize_jpeg: baseline-JPEG decode (both MCU
    shapes — 4:4:4 and 4:2:0 alternate by image-key parity) -> resize ->
    lossless PNG re-encode, checked byte-exact against the 64-row expected
    table. The doc_id % 3 subsample bounds the per-run JPEG work (the
    encoder runs a full DCT per image) while still hitting every key
    residue as the corpus grows (gcd(3, 64) = 1), so BOTH subsampling
    paths stay inside the hash-checked surface."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 3 == 0)
    )
    media = MM.as_jpeg_media(docs, key_mod=64)
    resized = MM.resize_media(media, 16, 16)
    return resized.select(
        "media_id",
        "width",
        "height",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha"),
    )


@register(
    "text_compression_census",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_compression_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-oracle twin of text_compression_ratio's input leg (r10 verdict
    #5): the pre-compression byte census, computed through the SAME Arrow
    mapInPandas plumbing the ratio uses (pandas str.encode -> len), so the
    oracle pins the UTF-8 encode + Arrow transfer that feeds zlib. The
    ratio itself stays rows-only by design — DEFLATE output is a property
    of the zlib build, not of the data."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def _census(batches):
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.str.len(),
                    "n_chars": pdf["text"].str.len(),
                }
            )

    return docs.mapInPandas(_census, "doc_id long, n_bytes long, n_chars long")
