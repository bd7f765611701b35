"""Document deduplication pack (exact, n-gram Jaccard, MinHash-LSH, SimHash).

Generalization of the reference's duplicate detection — exact key dup
groups (reference matching_script.py:221-242 on (number, designation);
import_data_db.py:440-473 on (uic_ref, lower(local_ref))) — to the
near-dup family a web-scale training-data pipeline needs.

Cross-engine determinism: every hash bottoms out in MD5 (identical in
Spark/DuckDB/Python); 64-bit integers are derived from the first 15 hex
chars (60 bits, stays positive in signed int64 in every engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import fingerprint, norm_text

# MinHash parameters — shared with the DuckDB oracle SQL (keep in sync
# with __spark_entry__.py). Mersenne prime modulus keeps (a*x+b) % p
# exact in int64 arithmetic for x < 2^60 ... (a*x) can overflow int64!
# So we keep x to 30 bits: md5-derived 7 hex chars (28 bits).
MINHASH_PRIME = (1 << 31) - 1
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1 + 2 * k, 12345 + 777 * k) for k in range(16)
]
LSH_BAND_ROWS = 4  # 16 hashes -> 4 bands of 4


def md5_int(c: Column, hex_chars: int = 7) -> Column:
    """First `hex_chars` hex chars of md5 -> non-negative bigint.

    7 chars = 28 bits: safe for (a*x+b) % p in 64-bit signed arithmetic
    with a < 2^31. DuckDB mirror:
    cast(('0x' || substr(md5(x),1,7)) as bigint).
    """
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text (array<string>)."""
    w = F.split(norm_text(c), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)]))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via md5 fingerprint; canonical = min id per group (A3)."""
    fp = docs.select(
        F.col(id_col), fingerprint(F.col(text_col), prefix_len=10_000).alias("fp")
    )
    win = W.partitionBy("fp")
    return fp.select(
        id_col,
        "fp",
        F.count("*").over(win).alias("dup_count"),
        (F.col(id_col) == F.min(id_col).over(win)).alias("is_canonical"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs word-n-gram Jaccard >= threshold (a_id < b_id).

    Plan shape: explode distinct shingles -> self equi-join on shingle
    (the blocking key — same role as the reference's UIC block) ->
    count common -> |A∪B| = |A|+|B|-common. One shuffle on shingle,
    one on the pair key; no cross join ever materializes.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).where(F.trim(F.col("shingle")) != "")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signature(c: Column, n: int = 3) -> Column:
    """array<bigint> of 16 minhash values over word-n-gram shingles.

    NOTE: inlining this Column 16x lets Catalyst's CollapseProject
    re-expand the md5 transform per use — prefer ``minhash_signatures``
    (the DataFrame variant below) which forces materialization barriers.
    """
    hashes = F.transform(word_shingles(c, n), lambda s: md5_int(s))
    sig = [
        F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)))
        for a, b in MINHASH_COEFFS
    ]
    return F.array(*sig)


def minhash_signatures(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig) with the md5 shingle hashing computed exactly once.

    The repartition between the hash step and the 16 signature
    expressions is a deliberate pipeline barrier: without it Catalyst
    collapses the projections and recomputes the md5 transform once per
    signature slot (16x) and again per LSH band key (4x) — a 64x CPU
    blow-up measured at sf0.1. The shuffle also buys scan-side
    parallelism for skinny single-file inputs.
    """
    hs = (
        docs.select(
            F.col(id_col).alias("id"),
            F.transform(word_shingles(F.col(text_col), n), lambda s: md5_int(s)).alias("hs"),
        )
        .where(F.size(F.col("hs")) > 0)
        .repartition("id")
    )
    sig = [
        F.array_min(
            F.transform(F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME))
        )
        for a, b in MINHASH_COEFFS
    ]
    return hs.select("id", F.array(*sig).alias("sig")).repartition("id")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + banded LSH candidate generation + estimated Jaccard.

    16-hash signature, 4 bands x 4 rows: candidate pairs collide on at
    least one full band; estimate = fraction of agreeing hash positions.
    At scale this replaces the O(pairs-sharing-a-shingle) blow-up of
    ``ngram_jaccard_pairs`` with O(4 x docs) band keys.
    """
    sigs = minhash_signatures(docs, n=n, text_col=text_col, id_col=id_col)
    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at(F.col("sig"), bi * LSH_BAND_ROWS + r + 1)
                                for r in range(LSH_BAND_ROWS)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(len(MINHASH_COEFFS) // LSH_BAND_ROWS)
                ]
            )
        ).alias("bk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cands.withColumn("est_jaccard", agree / F.lit(len(MINHASH_COEFFS)))
        .where(F.col("est_jaccard") >= threshold)
        .select("a_id", "b_id", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def simhash_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) with the token-hash array materialized once
    (same CollapseProject hazard as minhash: 60 bit-vote expressions
    would each re-run the md5 transform without the barrier)."""
    hs = docs.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(F.split(norm_text(F.col(text_col)), r"\s+")),
            lambda w: md5_int(w, hex_chars=15),
        ).alias("hs"),
    ).repartition(id_col)
    bits = []
    for bpos in range(60):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, bpos).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(
            F.when(vote > 0, F.lit(1 << bpos).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return hs.select(id_col, out.alias("simhash"))


def simhash64(c: Column, n: int = 1) -> Column:
    """64-bit SimHash over word (n=1) hashes, pure Catalyst.

    bit_b(simhash) = 1 iff sum over tokens of sign(bit_b(h(token))) > 0.
    Expressed as 64 aggregate lambda expressions over the token-hash
    array — heavy to *write*, but codegen collapses it into one pass.
    Uses 60-bit md5-derived hashes (15 hex chars).
    """
    hashes = F.transform(
        F.array_distinct(F.split(norm_text(c), r"\s+")),
        lambda w: md5_int(w, hex_chars=15),
    )
    bits = []
    for bpos in range(60):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, bpos).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(F.when(vote > 0, F.lit(1 << bpos).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bcol in bits[1:]:
        out = out.bitwiseOR(bcol)
    return out
