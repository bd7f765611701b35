"""Line-level corpus cleaning (C4 / RefinedWeb-style).

Web-scale training corpora carry two intra-document pathologies that
document-level dedup (operators/dedup.py) cannot see: repeated lines
inside one document (navigation chrome, scraped pagination) and
boilerplate lines shared across many documents (cookie banners,
footers). The standard cleaning pass drops both; this is its
deterministic Spark formulation.

Contract (deterministic, order-preserving):
1. Split text on newlines; a line's identity is its normalized form
   (lower + full ASCII-whitespace trim — ``functions.text.trim_ws`` —
   so a tab-padded boilerplate line and its space-padded twin collapse
   to ONE form; web nav/footer lines arrive with every padding).
2. WITHIN a document: keep only the FIRST occurrence of each normalized
   line (by line position) — unless the form is empty: blank separator
   lines all stay (mirroring step 3's carve-out; the engine, the DuckDB
   oracle's ``rk = 1 OR form = ''`` and the pandas reference all agree).
3. ACROSS the corpus: drop every line whose normalized form occurs in
   more than ``max_line_df`` DISTINCT documents (the boilerplate
   threshold), unless the form is empty (blank separators stay).
4. Reassemble surviving lines in original order.

Scale shape (100 TB): the main branch is ONE text scan -> explode ->
(doc, line-form) window -> broadcast boilerplate join -> one
groupBy(doc) rebuild (the per-doc input line count rides the explode,
so there is no second per-doc count scan and no final outer join). The
boilerplate-frequency branch is a second pruned scan collapsed to
scan -> explode -> filter -> map-side-distinct aggregate (no window:
countDistinct(doc) is invariant under the first-occurrence dedup, and
Catalyst's pushdown specializes the branch anyway, so sharing the main
branch's exchange is not structurally possible); its output — the
distinct boilerplate form set, compact by construction — broadcasts.
No UDFs; the only higher-order call (rebuilding the line array) runs
once per document over an already-aggregated array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import trim_ws, words


def ngram_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style word-n-gram repetition signals ->
    (id_col, top_{n}gram_char_frac ..., dup_{n}gram_char_frac ...).

    The word-level complement of ``line_stats``: line dedup cannot see a
    phrase looping WITHIN one line ("buy now buy now buy now ..."), the
    classic SEO-spam shape the MassiveText/Gopher rules drop. Over the
    whitespace tokens of the normalized text (``functions.text.words`` —
    lower + full-ASCII trim + \\s+ split, the repo-wide convention):

    top_{n}gram_char_frac = count(most frequent n-gram) * len(gram)
                            / norm_len           (Gopher: n = 2, 3, 4)
    dup_{n}gram_char_frac = sum over grams seen >= 2 times of
                            count * len(gram) / norm_len  (n = 5 .. 10)

    where "most frequent" is argmax by COUNT (the published rule), a
    count tie breaking toward the larger char mass — deterministic in
    every mirror, unlike the reference implementations' Counter
    insertion order; len(gram) counts the single-space-joined form and
    norm_len is the length of the whole space-joined token stream (=
    the fingerprint normalization's length). Overlapping occurrences
    are NOT
    de-overlapped (the standard published simplification of Gopher's
    "taking care not to count characters twice"); fractions are capped
    at 1.0 and rounded to 6 decimals, matching ``line_stats``'s
    convention. Documents with no tokens (or fewer than n) report 0.0.

    Scale shape (100 TB): one token explode -> ONE per-doc sort (a
    single window supplies every lead_k, k < max(ns)) -> |ns|+1 slim
    (id, n, gram) rows per token -> one count aggregate with map-side
    combine -> two per-doc reductions -> one join back to the id-only
    anchor scan (column-pruned; docs with no tokens coalesce to 0.0).
    The 1-gram stream rides along so norm_len (sum of token chars +
    separators) falls out of the SAME aggregate — no separate
    token-stats branch, scan, or extra per-doc shuffle. No UDFs, no
    higher-order lambdas; gram strings are the only wide shuffle
    payload, bounded by max(ns) * token length.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns) | {1})
    if min(all_ns) < 1:
        raise ValueError("ngram_stats needs n >= 1")
    if len(set(top_ns)) != len(tuple(top_ns)) or len(set(dup_ns)) != len(
        tuple(dup_ns)
    ):
        # a repeated n would emit two identical _t{n}/_d{n} aggregate
        # aliases and crash later with an opaque AMBIGUOUS_REFERENCE
        raise ValueError("ngram_stats: top_ns/dup_ns must not repeat an n")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "tok"),
    )
    w = W.partitionBy("id").orderBy("pos")
    led = toks.select(
        "id",
        "tok",
        *[F.lead("tok", k).over(w).alias(f"_l{k}") for k in range(1, max(all_ns))],
    )
    gram_structs = []
    for n in all_ns:
        parts = [F.col("tok")] + [F.col(f"_l{k}") for k in range(1, n)]
        gram = F.concat_ws(" ", *parts)
        # tail positions lack a full window: concat_ws SKIPS nulls, so an
        # unguarded tail would emit a shorter (duplicate-inflating) gram
        valid = F.col(f"_l{n-1}").isNotNull() if n > 1 else F.lit(True)
        gram_structs.append(
            F.struct(
                F.lit(n).alias("n"), F.when(valid, gram).alias("gram")
            )
        )
    grams = (
        led.select("id", F.explode(F.array(*gram_structs)).alias("g"))
        .select("id", "g.n", "g.gram")
        .where(F.col("gram").isNotNull())
    )
    cnt = grams.groupBy("id", "n", "gram").agg(F.count("*").alias("c"))
    per_n = cnt.groupBy("id", "n").agg(
        # char mass of the MOST FREQUENT n-gram (Gopher's rule is
        # argmax by count, not max mass): lexicographic struct max =
        # highest count first, ties broken toward the larger char mass
        # (deterministic, unlike Counter insertion order)
        F.max(
            F.struct(
                F.col("c").alias("c"),
                (F.col("c") * F.length("gram")).alias("w"),
            )
        )
        .getField("w")
        .alias("top_w"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("gram")).otherwise(
                F.lit(0)
            )
        ).alias("dup_w"),
        # n=1 feeds norm_len: all-occurrence char mass + token count
        F.sum(F.col("c") * F.length("gram")).alias("all_w"),
        F.sum("c").alias("n_occ"),
    )
    wide = per_n.groupBy("id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_w"))).alias(f"_t{n}")
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("dup_w"))).alias(f"_d{n}")
            for n in dup_ns
        ],
        # norm_len = token chars + (T-1) separators; >= 1 whenever the
        # doc has any token, so the divisions below can never hit ANSI's
        # divide-by-zero (token-less docs are absent here and coalesce
        # to 0.0 after the left join)
        (
            F.max(F.when(F.col("n") == 1, F.col("all_w")))
            + F.max(F.when(F.col("n") == 1, F.col("n_occ")))
            - 1
        ).alias("_nl"),
    )
    out = docs.select(F.col(id_col).alias("id")).join(wide, "id", "left")
    frac = lambda c: F.round(  # noqa: E731
        F.least(F.lit(1.0), F.coalesce(c / F.col("_nl"), F.lit(0.0))), 6
    )
    return out.select(
        F.col("id").alias(id_col),
        *[
            frac(F.col(f"_t{n}")).alias(f"top_{n}gram_char_frac")
            for n in top_ns
        ],
        *[
            frac(F.col(f"_d{n}")).alias(f"dup_{n}gram_char_frac")
            for n in dup_ns
        ],
    )


BULLET_CHARS = ("•", "-", "*", "●")
ELLIPSES = ("...", "…")


def _is_bullet(form) -> "F.Column":
    return F.substring(form, 1, 1).isin(*BULLET_CHARS)


def _is_ellipsis(form) -> "F.Column":
    out = F.lit(False)
    for e in ELLIPSES:
        out = out | form.endswith(e)
    return out


def line_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document line signals ->
    (id_col, n_lines, dup_line_frac, dup_line_char_frac,
    bullet_line_frac, ellipsis_line_frac).

    Over NON-EMPTY normalized lines of each document:
    dup_line_frac       = (lines - distinct lines) / lines
    dup_line_char_frac  = chars in repeat occurrences / total chars
    (a line form occurring c times with L chars contributes (c-1)*L);
    bullet_line_frac    = lines starting with a bullet char
                          ({'•', '-', '*', '●'}) / lines
    ellipsis_line_frac  = lines ending with '...' or '…' / lines
    (the Gopher format filters: > 90% bullet or > 30% ellipsis lines
    marks a listing/snippet page, occurrence-weighted like the dup
    fractions). Documents with no non-empty lines report zeros.

    Scale shape: one explode, one (doc, line-form) aggregate, one
    per-doc aggregate — the same shuffle key layout as clean_lines'
    main branch; no window, no UDF. The standard repetition filters of
    the Gopher/MassiveText quality rules, kept deterministic and
    SQL-mirrorable for the oracle.
    """
    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("line"),
        )
        .withColumn("form", F.lower(trim_ws(F.col("line"))))
        .where(F.col("form") != "")
    )
    per_form = lines.groupBy("id", "form").agg(
        F.count("*").alias("_c"), F.length(F.first("form")).alias("_len")
    )
    per_doc = per_form.groupBy("id").agg(
        F.sum("_c").alias("n_lines"),
        (F.sum("_c") - F.count("*")).alias("_dups"),
        F.sum(F.col("_c") * F.col("_len")).alias("_chars"),
        F.sum((F.col("_c") - 1) * F.col("_len")).alias("_dup_chars"),
        F.sum(
            F.when(_is_bullet(F.col("form")), F.col("_c")).otherwise(F.lit(0))
        ).alias("_bullets"),
        F.sum(
            F.when(_is_ellipsis(F.col("form")), F.col("_c")).otherwise(
                F.lit(0)
            )
        ).alias("_ellipses"),
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        F.round(
            F.coalesce(F.col("_dups") / F.col("n_lines"), F.lit(0.0)), 6
        ).alias("dup_line_frac"),
        F.round(
            F.coalesce(F.col("_dup_chars") / F.col("_chars"), F.lit(0.0)), 6
        ).alias("dup_line_char_frac"),
        F.round(
            F.coalesce(F.col("_bullets") / F.col("n_lines"), F.lit(0.0)), 6
        ).alias("bullet_line_frac"),
        F.round(
            F.coalesce(F.col("_ellipses") / F.col("n_lines"), F.lit(0.0)), 6
        ).alias("ellipsis_line_frac"),
    )


def clean_lines(
    docs: DataFrame,
    max_line_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_stats: bool = False,
) -> DataFrame:
    """-> (id_col, text_clean, n_lines_in, n_lines_kept).

    ``max_line_df``: a normalized line occurring in MORE than this many
    distinct documents is boilerplate and is removed everywhere.

    ``with_stats``: additionally emit the ``line_stats`` Gopher line
    signals (``dup_line_frac``, ``dup_line_char_frac``,
    ``bullet_line_frac``, ``ellipsis_line_frac`` — computed over the
    RAW pre-cleaning lines; post-cleaning the dup fractions are 0 by
    construction) for FREE: the per-(doc, form) occurrence count
    rides the existing first-occurrence window (same partition+order
    spec, so one Window operator, zero extra shuffles or scans), and
    the per-doc reductions ride the existing rebuild aggregate. This is
    how the corpus pipeline feeds its ``high_line_repetition`` rule
    without a third text scan.
    """
    # ONE scan: the line count rides the explode as a per-row constant,
    # so no second pass over the (dominant at corpus scale) text column
    # and no final per-doc join is needed — every doc has >= 1 exploded
    # row (split always yields at least one element), so the single
    # groupBy(id) below sees every doc, including ones whose lines all
    # drop as boilerplate.
    split_c = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    raw = docs.select(
        F.col(id_col).alias("id"),
        # n_in = size(split_c), but size(split) would SPLIT THE TEXT A
        # SECOND TIME (the Project under Generate evaluates it before
        # posexplode re-evaluates the split): count separators instead
        # — split keeps trailing empties (limit -1), so size is always
        # newline-count + 1, one regexp scan, no second array build.
        # Deriving it from max(pos) downstream is NOT equivalent: rows
        # are dropped between the explode and the rebuild aggregate.
        (
            F.regexp_count(F.coalesce(F.col(text_col), F.lit("")), F.lit("\n"))
            + F.lit(1)
        ).cast("int").alias("n_in"),
        F.posexplode(split_c).alias("pos", "line"),
    ).withColumn("form", F.lower(trim_ws(F.col("line"))))

    # within-doc first occurrence (step 2). When stats ride along, the
    # per-(doc, form) occurrence count uses the SAME partition+order
    # spec (full-frame window), so Catalyst plans ONE Window operator —
    # after the rk==1 filter each non-empty form survives exactly once
    # carrying its total count, which is all line_stats needs.
    first_w = W.partitionBy("id", "form").orderBy("pos")
    lines = raw.withColumn("_rk", F.row_number().over(first_w))
    if with_stats:
        cnt_w = first_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        lines = lines.withColumn("_cnt", F.count("*").over(cnt_w))
    lines = lines.where((F.col("_rk") == 1) | (F.col("form") == ""))

    # corpus-wide document frequency per form (step 3), computed from
    # the RAW explode: countDistinct(id) is invariant under the
    # first-occurrence dedup, and basing this branch on `raw` lets
    # Catalyst prune it to scan -> explode -> filter -> two-level
    # aggregate (no window/sort) with map-side (form, id) collapse —
    # the branch shuffles only distinct (form, id) pairs.
    ldf = (
        raw.where(F.col("form") != "")
        .groupBy("form")
        .agg(F.countDistinct("id").alias("_df"))
        .where(F.col("_df") > F.lit(max_line_df))
        .select("form", F.lit(True).alias("_boiler"))
    )
    # boilerplate lines stay in the frame as NULLed entries (collect_list
    # skips nulls) so ONE groupBy(id) rebuilds every doc — no separate
    # per-doc count frame, no outer join
    stat_cols = []
    if with_stats:
        # each surviving non-empty form appears exactly once (rk==1)
        # with its in-doc occurrence total _cnt — the line_stats inputs
        ne = F.col("form") != ""
        stat_cols = [
            F.when(ne, F.col("_cnt")).otherwise(F.lit(0)).alias("_sc"),
            F.when(ne, F.col("_cnt") * F.length("form"))
            .otherwise(F.lit(0))
            .alias("_schars"),
            F.when(ne, (F.col("_cnt") - 1) * F.length("form"))
            .otherwise(F.lit(0))
            .alias("_sdup_chars"),
            F.when(ne, F.lit(1)).otherwise(F.lit(0)).alias("_sforms"),
            F.when(ne & _is_bullet(F.col("form")), F.col("_cnt"))
            .otherwise(F.lit(0))
            .alias("_sbullets"),
            F.when(ne & _is_ellipsis(F.col("form")), F.col("_cnt"))
            .otherwise(F.lit(0))
            .alias("_sellipses"),
        ]
    flagged = lines.join(ldf, "form", "left").select(
        "id",
        "n_in",
        F.when(F.col("_boiler").isNull(), F.struct("pos", "line")).alias(
            "_kept"
        ),
        *stat_cols,
    )
    stat_aggs = []
    if with_stats:
        stat_aggs = [
            F.sum("_sc").alias("_n_ne"),
            F.sum("_sforms").alias("_n_forms"),
            F.sum("_schars").alias("_chars"),
            F.sum("_sdup_chars").alias("_dup_chars"),
            F.sum("_sbullets").alias("_bullets"),
            F.sum("_sellipses").alias("_ellipses"),
        ]
    rebuilt = flagged.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list("_kept")), lambda s: s["line"]
            ),
        ).alias("text_clean"),
        F.first("n_in").alias("n_lines_in"),
        F.count("_kept").alias("n_lines_kept"),
        *stat_aggs,
    )
    out_stats = []
    if with_stats:
        # identical rounding convention to line_stats so the oracle and
        # the rule threshold compare the same 6-decimal value
        # explicit zero-guards (not coalesce-after-divide): a doc with no
        # non-empty lines divides by 0, which raises under ANSI mode
        out_stats = [
            F.round(
                F.when(
                    F.col("_n_ne") > 0,
                    (F.col("_n_ne") - F.col("_n_forms")) / F.col("_n_ne"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.col("_chars") > 0, F.col("_dup_chars") / F.col("_chars")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.when(
                    F.col("_n_ne") > 0, F.col("_bullets") / F.col("_n_ne")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("bullet_line_frac"),
            F.round(
                F.when(
                    F.col("_n_ne") > 0, F.col("_ellipses") / F.col("_n_ne")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ellipsis_line_frac"),
        ]
    return rebuilt.select(
        F.col("id").alias(id_col),
        "text_clean",
        "n_lines_in",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        *out_stats,
    )
