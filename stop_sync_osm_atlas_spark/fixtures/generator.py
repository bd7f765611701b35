"""Deterministic synthetic pairs generator with planted ground truth.

FIXTURES.md §1: seeded (numpy default_rng), identical bytes across runs.
Every row carries a hidden planted label in a *separate* labels table
(the engine never reads it; pytest compares engine output against it
and against the independent pandas oracle).

Planted categories mirror the reference's problem taxonomy
(reference documentation/PROBLEMS_DEFINITIONS.md; matching cascade
stages matching_script.py:246-344): clean keeps per language, each
drop-rule violation, PII/toxicity scrub rows, scrub->drop escalation,
near-dup clusters (incl. one hot phash bucket holding ~5% of rows to
exercise mandated salting), corrupt image streams, and overrides that
conflict with rule outcomes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.image import MAGIC, encode_image
from .norm_tables import STOPWORDS

SEED = 42
BUCKET_BITS = 16
SUB_BITS = 8

# Non-stopword vocabulary per language (ASCII, deterministic).
_CONTENT: dict[str, list[str]] = {
    "en": "mountain river village train station platform window garden bridge forest market street harbor castle museum valley meadow tower church school bakery library cinema".split(),
    "de": "berg fluss dorf zug bahnhof bahnsteig fenster garten bruecke wald markt strasse hafen schloss museum tal wiese turm kirche schule baeckerei bibliothek kino".split(),
    "fr": "montagne riviere village train gare quai fenetre jardin pont foret marche rue port chateau musee vallee prairie tour eglise ecole boulangerie bibliotheque".split(),
    "it": "montagna fiume villaggio treno stazione binario finestra giardino ponte foresta mercato strada porto castello museo valle prato torre chiesa scuola panetteria".split(),
}
_GIBBERISH = "zxq vqk pzw qjx wvz xkq zqv kqx jzw qzp xwk vjq".split()


@dataclass
class Fixture:
    pairs: pd.DataFrame
    labels: pd.DataFrame
    overrides: pd.DataFrame


def _caption(rng: np.random.Generator, lang: str, n_words: int) -> str:
    """Clean caption: ~1/3 stopwords interleaved with content words.

    Resamples until repetition ratio stays clear of the 0.5 rule
    threshold (planted keeps must not trip any rule by accident).
    """
    sw = STOPWORDS[lang]
    content = _CONTENT[lang]
    for _ in range(50):
        words = []
        for j in range(n_words):
            if j % 3 == 1:
                words.append(sw[int(rng.integers(len(sw)))])
            else:
                words.append(content[int(rng.integers(len(content)))])
        cap = " ".join(words)
        if _rep_ratio(cap) < 0.4:
            return cap
    # fall back (large n_words, e.g. planted too-long rows where the
    # too_long rule outranks repetition anyway): cycle the pool.
    pool = list(dict.fromkeys(content + sw))
    return " ".join(pool[j % len(pool)] for j in range(n_words))


def _rep_ratio(text: str) -> float:
    w = text.lower().split()
    return 1 - len(set(w)) / len(w) if w else 0.0


def generate(
    n_rows: int = 1000, seed: int = SEED, dims: tuple[int, ...] = (32, 64)
) -> Fixture:
    """``dims``: candidate square image sizes. The default keeps unit
    tests fast; the scaling benchmark uses production-weight sizes so
    decode dominates compute the way a real corpus does."""
    rng = np.random.default_rng(seed)
    langs = sorted(STOPWORDS)

    rows: list[dict] = []
    labels: list[dict] = []
    overrides: list[dict] = []

    # ---- category plan -------------------------------------------------
    # fractions: clean 55%, neardup clusters 15%, hot-bucket 5%,
    # each violation ~2-4%, scrub 6%, corrupt 3%, pii_only 1%.
    i = 0

    def next_id() -> str:
        nonlocal i
        s = f"img:{i:012d}"
        i += 1
        return s

    def base_img(rng) -> tuple[int, int, str, int]:
        w = int(rng.choice(list(dims)))
        fmt = str(rng.choice(["png", "jpeg"]))
        return w, w, fmt, int(rng.integers(0, 2**63))

    def add_row(
        image_id: str,
        caption: str | None,
        phash: int,
        decision: str,
        rule: str | None,
        scrubbed: str | None = None,
        cluster: str | None = None,
        lang: str | None = None,
        corrupt: str | None = None,
    ) -> None:
        w, h, fmt, iseed = base_img(rng)
        b: bytes | None = encode_image(iseed, w, h, fmt)
        if corrupt == "truncated":
            b = b[: len(MAGIC) + 3]
        elif corrupt == "garbage":
            b = b"NOTANIMG" + bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        elif corrupt == "null_bytes":
            b = None
        elif corrupt == "bad_fmt":
            fmt = str(rng.choice(["bmp", ""]))
        elif corrupt == "bad_dims":
            w = 0
        rows.append(
            dict(
                image_id=image_id, bytes=b, w=np.int32(w), h=np.int32(h),
                fmt=fmt, caption=caption, phash=np.int64(np.uint64(phash).astype(np.int64)),
            )
        )
        labels.append(
            dict(
                image_id=image_id,
                true_decision=decision,
                true_rule=rule,
                true_scrubbed_caption=scrubbed if scrubbed is not None else caption,
                true_cluster_id=cluster if cluster is not None else image_id,
                lang=lang,
            )
        )

    def rand_phash() -> int:
        return int(rng.integers(0, 2**64, dtype=np.uint64))

    # hot bucket constant (the planted ~5% skew bucket)
    hot_low = int(rng.integers(0, 2**BUCKET_BITS))

    n_hot = max(4, n_rows * 5 // 100)
    n_cluster_rows = max(4, n_rows * 15 // 100)
    n_scrub = max(4, n_rows * 6 // 100)
    n_corrupt = max(5, n_rows * 3 // 100)
    n_violation_each = max(2, n_rows * 2 // 100)
    n_pii_only = max(1, n_rows // 100)

    # ---- near-dup clusters (cold buckets) ------------------------------
    made = 0
    while made < n_cluster_rows:
        size = int(rng.integers(2, 6))
        base = rand_phash()
        lang = langs[int(rng.integers(len(langs)))]
        cap = _caption(rng, lang, int(rng.integers(8, 20)))
        ids = [next_id() for _ in range(size)]
        rep = min(ids)
        for k, mid in enumerate(ids):
            ph = base
            if k > 0:
                nflip = int(rng.integers(0, 4))
                if nflip > 0 and rng.random() < 0.3:
                    # cross-window member: exactly ONE flipped bit inside
                    # the bucket window (lands in a different bucket than
                    # the base; reachable only via the multi-probe bridge,
                    # operators/neardup.py pass 3) + the rest above it
                    low = int(rng.integers(0, BUCKET_BITS))
                    ph ^= 1 << low
                    highs = rng.choice(
                        np.arange(BUCKET_BITS, 64), size=nflip - 1, replace=False
                    )
                else:
                    highs = rng.choice(
                        np.arange(BUCKET_BITS, 64), size=nflip, replace=False
                    )
                for fb in highs:
                    ph ^= 1 << int(fb)
            # members share the rep's caption VERBATIM (deliberate:
            # the clustering under test keys on phash Hamming distance
            # only — caption equality is incidental — and the fixture
            # bytes must stay stable across rounds for bench
            # comparability; the phash path is isolated by the planted
            # ground-truth stress in tests/test_neardup.py instead)
            add_row(
                mid, cap, ph,
                "keep" if mid == rep else "drop",
                None if mid == rep else "near_duplicate",
                cluster=rep, lang=lang,
            )
            made += 1

    # ---- hot bucket (skew): mostly singletons + a few clusters ---------
    made = 0
    while made < n_hot:
        lang = langs[int(rng.integers(len(langs)))]
        if rng.random() < 0.2 and n_hot - made >= 3:
            size = 3
            high = int(rng.integers(0, 2**48)) << BUCKET_BITS
            base = high | hot_low
            cap = _caption(rng, lang, int(rng.integers(8, 20)))
            ids = [next_id() for _ in range(size)]
            rep = min(ids)
            for k, mid in enumerate(ids):
                ph = base
                if k > 0:
                    # flip only bits above bucket+sub window so planted
                    # clusters never straddle salted sub-buckets
                    nflip = int(rng.integers(0, 4))
                    flips = rng.choice(
                        np.arange(BUCKET_BITS + SUB_BITS, 64), size=nflip, replace=False
                    )
                    for fb in flips:
                        ph ^= 1 << int(fb)
                add_row(
                    mid, cap, ph,
                    "keep" if mid == rep else "drop",
                    None if mid == rep else "near_duplicate",
                    cluster=rep, lang=lang,
                )
                made += 1
        else:
            high = int(rng.integers(0, 2**48)) << BUCKET_BITS
            ph = high | hot_low
            cap = _caption(rng, lang, int(rng.integers(6, 24)))
            add_row(next_id(), cap, ph, "keep", None, lang=lang)
            made += 1

    # ---- violations -----------------------------------------------------
    for _ in range(n_violation_each):  # empty / null captions
        add_row(next_id(), None if rng.random() < 0.5 else "   ",
                rand_phash(), "drop", "empty_caption")
    for _ in range(n_violation_each):  # too short
        lang = langs[int(rng.integers(len(langs)))]
        add_row(next_id(), _caption(rng, lang, int(rng.integers(1, 5))),
                rand_phash(), "drop", "caption_too_short", lang=lang)
    for _ in range(n_violation_each):  # too long
        lang = langs[int(rng.integers(len(langs)))]
        add_row(next_id(), _caption(rng, lang, 257 + int(rng.integers(0, 40))),
                rand_phash(), "drop", "caption_too_long", lang=lang)
    for _ in range(n_violation_each):  # repetition
        lang = langs[int(rng.integers(len(langs)))]
        word = _CONTENT[lang][int(rng.integers(len(_CONTENT[lang])))]
        n = int(rng.integers(8, 16))
        cap = " ".join([word] * n + [_CONTENT[lang][int(rng.integers(len(_CONTENT[lang])))] for _ in range(max(1, n // 4))])
        assert _rep_ratio(cap) >= 0.5
        add_row(next_id(), cap, rand_phash(), "drop", "repetition", lang=lang)
    for _ in range(n_violation_each):  # symbol ratio
        lang = langs[int(rng.integers(len(langs)))]
        base_cap = _caption(rng, lang, 6)
        # distinct symbol tokens: must trip symbol_ratio, not repetition
        cap = base_cap + " #$%&!* @!^&*( {}[]<> ++--=="
        add_row(next_id(), cap, rand_phash(), "drop", "symbol_ratio", lang=lang)
    for _ in range(n_violation_each):  # low stopword density (>=20 words)
        lang = langs[int(rng.integers(len(langs)))]
        content = _CONTENT[lang]
        # sample w/o replacement chunks to avoid tripping repetition
        k = 22
        words = []
        while len(words) < k:
            words.extend(rng.permutation(content).tolist())
        add_row(next_id(), " ".join(words[:k]), rand_phash(), "drop",
                "low_stopword_density", lang=lang)
    for _ in range(n_violation_each):  # gibberish -> langid und
        n = int(rng.integers(8, 15))
        cap = " ".join(str(rng.choice(_GIBBERISH)) + str(rng.integers(10)) for _ in range(n))
        add_row(next_id(), cap, rand_phash(), "drop", "langid_undetermined")

    # ---- corrupt images -------------------------------------------------
    kinds = ["truncated", "garbage", "null_bytes", "bad_fmt", "bad_dims"]
    for j in range(n_corrupt):
        lang = langs[int(rng.integers(len(langs)))]
        add_row(next_id(), _caption(rng, lang, 10), rand_phash(),
                "drop", "corrupt_image", lang=lang, corrupt=kinds[j % len(kinds)])

    # ---- scrub rows -------------------------------------------------------
    from ..operators.scrub import scrub_python

    pii_bits = [
        lambda: f"contact {_tok(rng)}@example.com for info",
        lambda: f"see https://example.com/{int(rng.integers(1e6))} for details",
        lambda: f"call +41 79 {int(rng.integers(100,999))} {int(rng.integers(10,99))} {int(rng.integers(10,99))} today",
        lambda: f"ref {rng.integers(10**15, 10**16)} registered",
        lambda: "that badword1 comment was removed",
        lambda: "such a meanword remark indeed",
    ]
    for j in range(n_scrub):
        lang = langs[int(rng.integers(len(langs)))]
        cap = _caption(rng, lang, 8) + " " + pii_bits[j % len(pii_bits)]()
        scrubbed = scrub_python(cap)
        assert scrubbed != cap, cap
        add_row(next_id(), cap, rand_phash(), "scrub", "scrub",
                scrubbed=scrubbed, lang=lang)

    # ---- pii-only (scrub -> drop escalation) ----------------------------
    for _ in range(n_pii_only):
        cap = " ".join(f"{_tok(rng)}@mail{int(rng.integers(9))}.com" for _ in range(5))
        add_row(next_id(), cap, rand_phash(), "drop", "pii_only_after_scrub",
                scrubbed=scrub_python(cap))

    # ---- clean keeps (rest) ----------------------------------------------
    while i < n_rows:
        lang = langs[int(rng.integers(len(langs)))]
        cap = _caption(rng, lang, int(rng.integers(6, 30)))
        add_row(next_id(), cap, rand_phash(), "keep", None, lang=lang)

    pairs = pd.DataFrame(rows)
    labels_df = pd.DataFrame(labels)

    # ---- overrides: ~0.1% + guaranteed conflicts -------------------------
    cand = labels_df.sample(
        n=max(3, n_rows // 1000), random_state=seed
    )
    for _, r in cand.iterrows():
        forced = "drop" if r["true_decision"] == "keep" else "keep"
        overrides.append(
            dict(
                image_id=r["image_id"],
                forced_decision=forced,
                reason="fixture conflict override",
                created_at=pd.Timestamp("2026-01-01T00:00:00"),
            )
        )
    overrides_df = pd.DataFrame(overrides)
    # overrides win: patch planted labels
    ov_map = dict(zip(overrides_df["image_id"], overrides_df["forced_decision"]))
    mask = labels_df["image_id"].isin(ov_map)
    labels_df.loc[mask, "true_decision"] = labels_df.loc[mask, "image_id"].map(ov_map)
    labels_df.loc[mask, "true_rule"] = "override"

    return Fixture(pairs=pairs, labels=labels_df, overrides=overrides_df)


def _tok(rng: np.random.Generator) -> str:
    letters = "abcdefghijklmnopqrstuvwxyz"
    return "".join(letters[int(x)] for x in rng.integers(0, 26, 6))


def write_fixture(fx: Fixture, root: str, n_shards: int = 1) -> dict[str, str]:
    """Write pairs/labels/overrides as parquet (pyarrow, no Spark).

    ``n_shards`` > 1 writes pairs as a directory of shard files —
    emulates the multi-file layout a real table has, so local Spark
    scans get genuine task parallelism.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    paths = {}
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    paths["pairs"] = os.path.join(root, "pairs.parquet")
    if n_shards <= 1:
        t = pa.Table.from_pandas(fx.pairs, schema=schema, preserve_index=False)
        pq.write_table(t, paths["pairs"])
    else:
        os.makedirs(paths["pairs"], exist_ok=True)
        n = len(fx.pairs)
        step = (n + n_shards - 1) // n_shards
        for s in range(n_shards):
            chunk = fx.pairs.iloc[s * step : (s + 1) * step]
            if not len(chunk):
                break
            t = pa.Table.from_pandas(chunk, schema=schema, preserve_index=False)
            pq.write_table(t, os.path.join(paths["pairs"], f"part-{s:05d}.parquet"))
    for name, df in [("pairs_labels", fx.labels), ("overrides", fx.overrides)]:
        paths[name] = os.path.join(root, f"{name}.parquet")
        t2 = pa.Table.from_pandas(df, preserve_index=False)
        # Spark cannot read TIMESTAMP(NANOS); downcast to micros.
        for idx, f in enumerate(t2.schema):
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                t2 = t2.set_column(
                    idx, f.name, t2.column(idx).cast(pa.timestamp("us"))
                )
        pq.write_table(t2, paths[name])
    return paths
