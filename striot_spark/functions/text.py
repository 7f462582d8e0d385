"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — language
ID, quality scoring, token counting, and fingerprinting run at scan
speed with zero Python in the hot path. This is the 100 TB design: a
document-quality pass should be a single parquet scan + projection.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from striot_spark.core.scale import scatter

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

FINGERPRINT_MOD = 1_000_000_007
ROLLING_BASE = 31  # polynomial rolling-hash base (Rabin-Karp style)

# BPE-ish tokenizer regex: letter runs, 1-3 digit number chunks (BPE
# vocabularies split long numbers), single non-alnum marks. Kept to a
# syntax subset valid in both Java regex (Spark) and RE2 (DuckDB) so the
# oracle extracts identical tokens.
BPE_REGEX = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def nonempty_tokens(text: Column) -> Column:
    return F.filter(tokens_col(text), lambda t: t != F.lit(""))


def bpe_tokens(text: Column) -> Column:
    """BPE-ish subword tokens via regexp_extract_all — JVM-side, no UDF."""
    return F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def token_count(text: Column) -> Column:
    """Whitespace token count; array length of the split."""
    return F.size(F.filter(tokens_col(text), lambda t: t != F.lit("")))


def char_count_no_spaces(text: Column) -> Column:
    return F.length(F.replace(text, F.lit(" "), F.lit("")))


def stopword_hits(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return F.size(F.filter(tokens_col(text), lambda t: t.isin(*stopwords)))


def stopword_ratio(text: Column) -> Column:
    return stopword_hits(text) / token_count(text)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: stopword density + length band.

    Mirrors the 'quality scoring (length/punct/stopword ratios)' operator
    family; thresholds are engine policy, not reference-derived.
    """
    n = token_count(text)
    ratio = stopword_hits(text) / n
    length_ok = (n >= 20) & (n <= 10000)
    return (
        F.when(n == 0, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), ratio * 4) * 0.5 + length_ok.cast("double") * 0.5
        )
    )


def lang_hits(text: Column, lang: str) -> Column:
    return F.size(F.filter(tokens_col(text), lambda t: t.isin(*LANG_MARKERS[lang])))


def predict_lang(text: Column) -> Column:
    """Stopword-marker language ID; deterministic tie-break by language
    code order. SQL-mirrorable (list_filter in DuckDB)."""
    hits = {lang: lang_hits(text, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # build nested CASE from last language to first: earlier codes win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        out = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def md5_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 — chosen over Spark's
    murmur3 ``hash()`` because it is reproducible in any engine (the
    DuckDB oracle computes the identical value)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Bag-of-tokens document fingerprint: sum of per-token 60-bit hashes
    mod p. Order-insensitive by construction; near-duplicate docs with
    identical token bags collide.

    Computed as a pure projection — ``aggregate`` folds the in-row token
    array, so a 100 TB fingerprint pass is a single parquet scan with
    ZERO shuffles (the earlier explode+groupBy form shuffled every
    token). Zero-token docs are dropped (parity with the unnest-based
    oracle SQL).
    """
    df = scatter(df)
    toks = nonempty_tokens(F.col(text_col))
    contrib = F.aggregate(
        F.transform(toks, lambda t: md5_hash64(t) % FINGERPRINT_MOD),
        F.lit(0).cast("long"),
        lambda acc, h: acc + h,
    )
    return df.select(
        F.col(id_col),
        (contrib % FINGERPRINT_MOD).alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def rolling_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-SENSITIVE polynomial rolling hash (Rabin-Karp):
    ``h = fold(acc*B + hash(token) mod p)`` over tokens in document
    order. Complements the bag fingerprint: reordered docs collide
    there but not here. Pure projection — the fold runs over the in-row
    token array, zero shuffles at any scale.
    """
    df = scatter(df)
    toks = nonempty_tokens(F.col(text_col))
    roll = F.aggregate(
        F.transform(toks, lambda t: md5_hash64(t) % FINGERPRINT_MOD),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLLING_BASE + h) % FINGERPRINT_MOD,
    )
    return df.select(
        F.col(id_col),
        roll.alias("rolling_fp"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def build_vocab(
    df: DataFrame, text_col: str, vocab_size: int
) -> DataFrame:
    """Frequency-ranked vocabulary: the ``vocab_size`` most frequent
    tokens as ``(token, token_id)`` with id 0 = most frequent. Ties
    break on the token string, so the table is deterministic in any
    engine. One groupBy on the token; the ranking of the (tiny
    relative to the corpus) vocabulary table rides the size-gated
    ``global_index``.
    """
    from striot_spark.core.scale import global_index

    freq = (
        df.select(F.explode(nonempty_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ranked = global_index(
        freq, [F.col("tf").desc(), F.col("tok").asc()], "token_id"
    )
    return ranked.filter(F.col("token_id") < vocab_size).select(
        F.col("tok").alias("token"), "token_id"
    )


def encode_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document as its integer token-id sequence under
    ``vocab`` (OOV tokens → ``oov_id``), order-preserving — the
    tokenize-to-ids pass that feeds sequence packing.

    Lowering: the vocabulary is a MapType literal built from the
    (bounded, collectable) vocab table — the corpus encode is then a
    ZERO-JOIN, zero-shuffle projection, exactly the streamMapCache
    pattern (`functions/caching.py`). A vocab too large to inline
    would instead explode+join+re-collect_list (three shuffles of the
    corpus) — the map literal is the 100 TB-friendly plan as long as
    the vocabulary is executor-memory-bounded (64k BPE vocabs are).
    """
    pairs = [(r["token"], r["token_id"]) for r in vocab.collect()]
    if pairs:
        args: list[Column] = []
        for tok, tid in pairs:
            args.append(F.lit(tok))
            args.append(F.lit(int(tid)))
        vmap = F.create_map(*args)
    else:
        vmap = F.create_map().cast("map<string,int>")
    toks = nonempty_tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.transform(
            toks, lambda t: F.coalesce(vmap[t], F.lit(oov_id))
        ).cast("array<int>").alias("token_ids"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, ngram_n: int = 2
) -> DataFrame:
    """Intra-document repetition signals: total vs distinct n-gram
    counts and the duplicate-n-gram ratio (the Gopher/MassiveText-style
    repetition quality filter — heavily repeated n-grams mark boiler-
    plate and degenerate text; public methodology, Rae et al. 2021
    table A1).

    Pure zero-shuffle projection: the n-gram array lives inside the
    row; a 100 TB repetition pass is one parquet scan. Docs with no
    n-grams (fewer than n tokens) are excluded — they have no ratio.
    """
    from striot_spark.functions.dedup import shingles

    grams = shingles(F.col(text_col), ngram_n)
    n_all = F.size(grams)
    n_uniq = F.size(F.array_distinct(grams))
    return (
        df.select(
            F.col(id_col),
            n_all.cast("long").alias("n_ngrams"),
            n_uniq.cast("long").alias("n_unique"),
            ((n_all - n_uniq) / n_all).alias("dup_ratio"),
        )
        .filter(F.col("n_ngrams") > 0)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard LLM-corpus preprocessing step (context-window packing with
    overlap so no boundary-spanning content is lost).

    Chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; the final chunk may be short. Fully
    JVM-side: the chunk index range and slices are Column expressions
    (sequence/transform/slice) fanned out with ONE explode — a 100 TB
    chunking pass is a single scan with zero shuffles and zero Python.
    Output: (id, chunk_idx, chunk_text, n_tokens).
    """
    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = nonempty_tokens(F.col(text_col))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.size(F.col("__toks")) - F.lit(overlap)) / F.lit(float(stride))
        ).cast("long"),
    )
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    piece = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, max_tokens)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.col("__toks"), chunk)
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_cols: Sequence[str],
    budget: int,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs — the
    sequence-packing step that follows chunking in an LLM data
    pipeline (batch N docs into ~budget-token groups for tokenizer
    throughput / sample construction).

    Deterministic first-fit in ``id_col`` order within each shard: a
    doc's pack is ``floor(prev_cumulative_tokens / budget)``, so packs
    are contiguous runs and a pack overflows its budget by at most its
    final document. One shuffle (on ``shard_cols``) and one sort per
    shard; at 100 TB the shard key must be fine-grained (lang x hash
    bucket, not lang alone) so no single shard serializes — the packing
    rule is per-shard, so sharding finer only multiplies pack streams.
    Output: shard cols + (id, n_tokens, pack_id).
    """
    from pyspark.sql import Window as W

    toks = token_count(F.col(text_col))
    w = (
        W.partitionBy(*shard_cols)
        .orderBy(F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(*shard_cols, F.col(id_col), toks.alias("n_tokens"))
        .withColumn("pack_id", F.floor(prev_cum / F.lit(budget)))
    )


def doc_frequency(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document-frequency table: ``(token, df_ct)`` where ``df_ct`` is
    the number of distinct documents containing the token. The IDF side
    of TF-IDF and the feeder for stopword discovery / rare-token
    pruning.

    One corpus scan: explode to per-doc distinct tokens (the distinct
    is per-document inside ``array_distinct``, so the exploded stream
    carries no within-doc duplicates and the groupBy count IS the
    document frequency — no (doc, token) pre-aggregation shuffle), then
    one token-keyed count with map-side partial aggregation. Output is
    vocabulary-sized (≪ corpus), never the corpus itself.
    """
    toks = F.array_distinct(nonempty_tokens(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_ct"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Top-``k`` most distinctive terms per document by TF-IDF-style
    ranking — the keyword-extraction / topic-tagging pass of a corpus
    analytics pipeline.

    Rank contract: within a document, terms order by
    ``(tf DESC, df_ct ASC, token ASC)`` — frequency first, rarity as
    the tiebreak. This is the lexicographic form of tf·idf ranking and
    is chosen deliberately over ``tf * ln(N/df)`` for the ORDER itself:
    the float score is emitted for users (``tfidf``), but rank never
    depends on it, so results are bit-reproducible across engines and
    partitionings (``ln`` is not guaranteed correctly-rounded, and a
    1-ulp divergence must not flip a rank).

    Plan: one (doc, token) groupBy for TF; the document-frequency table
    (vocabulary-sized) broadcasts back onto it; corpus size N rides the
    same broadcast as a scalar count — no second corpus scan action,
    no corpus re-shuffle. Per-doc top-k is a window over the doc key
    (parallel, no global sort).
    """
    from pyspark.sql import Window as W
    from pyspark.sql.functions import broadcast

    tf = (
        df.select(
            F.col(id_col),
            F.explode(nonempty_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = doc_frequency(df, id_col, text_col)
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("_n_docs")
    )
    w = W.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df_ct").asc(), F.col("token").asc()
    )
    return (
        tf.join(broadcast(dfreq), "token")
        .join(broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("_n_docs") / F.col("df_ct")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df_ct", "rank", "tfidf")
    )


def blocked_terms(
    text: Column, blocklist: Sequence[str]
) -> Column:
    """The (sorted, distinct) blocklist terms present in ``text`` —
    token-boundary exact matches, not substrings (C4's badwords filter
    drops a page on any listed WORD; substring matching would also hit
    innocent carriers). Pure Column expression: array_intersect of the
    token set against an inline literal array, JVM-side.
    """
    terms = F.array(*[F.lit(t) for t in blocklist])
    return F.array_sort(
        F.array_intersect(F.array_distinct(nonempty_tokens(text)), terms)
    )


def blocklist_filter(
    df: DataFrame,
    text_col: str,
    blocklist: Sequence[str],
    keep_matches: bool = False,
) -> DataFrame:
    """Drop (or, with ``keep_matches``, keep only) documents containing
    any blocklisted token — the badwords / policy-filter pass of a
    training-data pipeline (C4-style).

    Zero-shuffle scan+filter: the blocklist inlines as an array literal
    (policy lists are KB-sized — executor-memory-bounded like the
    streamMapCache vocab), membership is ``arrays_overlap`` inside
    whole-stage codegen. At 100 TB this is a single parquet pass; an
    oversized blocklist would instead broadcast-join on exploded
    tokens, which re-shuffles nothing either but pays the explode.
    """
    terms = F.array(*[F.lit(t) for t in blocklist])
    hit = F.arrays_overlap(nonempty_tokens(F.col(text_col)), terms)
    return df.filter(hit if keep_matches else ~hit)


def linear_quality_score(
    text: Column,
    n_chars: Column,
    w_stop: int = 100,
    w_token: int = 10,
    w_punct: int = 50,
    target_chars: int = 180,
) -> Column:
    """Integer linear quality score — the shape of a trained
    (fasttext-style) document-quality classifier with its weights
    inlined as plan literals: stopword evidence up-weights natural
    prose, token mass rewards substance, punctuation noise and
    length deviation penalize. ALL-INTEGER on integral features, so
    thresholding is engine-exact (a float-weight model would gate on
    ulp-sensitive sums; quantize real model weights to integers the
    same way).
    """
    punct = F.length(F.regexp_replace(text, "[a-z0-9 ]", ""))
    return (
        F.lit(w_stop) * stopword_hits(text)
        + F.lit(w_token) * token_count(text)
        - F.lit(w_punct) * punct
        - F.abs(n_chars - F.lit(target_chars))
    ).cast("long")


def linear_quality_filter(
    df: DataFrame,
    text_col: str,
    n_chars_col: str,
    threshold: int,
    score_col: str = "quality",
) -> DataFrame:
    """Keep documents scoring at least ``threshold`` under
    ``linear_quality_score`` — the model-based quality gate of a
    training pipeline, as a zero-shuffle scan+filter (weights ride the
    plan; no join, no Python)."""
    scored = df.withColumn(
        score_col,
        linear_quality_score(F.col(text_col), F.col(n_chars_col)),
    )
    return scored.filter(F.col(score_col) >= threshold)


# PII masking patterns (C4/Dolma-style release scrubbing). Kept to a
# regex subset valid in Java regex (Spark) — applied via chained
# regexp_replace, zero-shuffle, no Python. Order matters: emails before
# bare digit runs so the user@host form is consumed whole.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # emails
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 13-19 digit runs with optional separators BETWEEN digits
    # (card-shaped; separators inside only, so no trailing-space grab)
    (r"\b\d(?:[ -]?\d){12,18}\b", "<NUMBER>"),
    # phone-shaped: optional +cc, then 7-12 digits with separators
    (r"(?<!\w)\+?\d{1,3}[ -.]?\(?\d{2,4}\)?(?:[ -.]?\d{2,4}){2,4}(?!\w)",
     "<PHONE>"),
)


def scrub_pii(text: Column, patterns=PII_PATTERNS) -> Column:
    """Mask PII-shaped spans (emails, IPs, card/phone-shaped digit
    runs) with typed placeholders — the release-scrubbing pass of a
    training-data pipeline. Chained ``regexp_replace`` Column
    expression: one corpus scan, whole-stage codegen, no Python.

    These are SHAPE detectors (the standard release-pipeline
    approach), not validators — a 16-digit run masks whether or not it
    Luhn-checks; precision is traded for recall deliberately, and the
    pattern list is an argument so estates can extend it (national id
    formats, internal hostnames).
    """
    out = text
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_hit_counts(text: Column, patterns=PII_PATTERNS) -> Column:
    """Per-pattern hit counts as a map<string,int> — the audit side of
    ``scrub_pii`` (how much masking a release pass would do), same
    zero-shuffle scan."""
    pairs: list[Column] = []
    for pat, repl in patterns:
        pairs.append(F.lit(repl))
        pairs.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("int")
        )
    return F.create_map(*pairs)


def domain_stats(
    df: DataFrame,
    domain_col: str,
    text_col: str,
) -> DataFrame:
    """Per-domain (per-source) corpus statistics: document count, total
    whitespace tokens, total English-stopword hits — ALL integers, so
    any downstream threshold is engine-exact.

    The domain-level aggregation view behind C4/RefinedWeb-style
    source filtering: quality is judged per DOMAIN, then applied per
    document. One groupBy on the domain key with map-side partial
    aggregation — executors ship one partial row per (partition,
    domain), never documents; at 100 TB the shuffled volume is
    O(domains), millions of rows at web scale, not corpus-sized.
    """
    text = F.col(text_col)
    return df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text)).alias("total_tokens"),
        F.sum(stopword_hits(text)).alias("stop_hits"),
    )


def domain_quality_filter(
    df: DataFrame,
    domain_col: str,
    text_col: str,
    min_stop_pct: int = 6,
) -> DataFrame:
    """Keep only documents from domains whose corpus-wide stopword
    density is at least ``min_stop_pct`` percent — the domain-level
    quality gate of a training-data pipeline (C4 drops whole domains,
    not single pages, to defeat per-page adversarial text).

    The gate `hits * 100 >= pct * tokens` is pure integer arithmetic
    (no float density), so keep/drop never depends on engine rounding.
    Two corpus scans total: one to build the domain table (shuffles
    O(domains) partial rows), one to apply it — the kept-domain list
    BROADCASTS to the second scan (domains << documents by
    construction), so the corpus itself is never shuffled.
    """
    stats = domain_stats(df, domain_col, text_col)
    keep = stats.filter(
        F.col("stop_hits") * F.lit(100)
        >= F.lit(int(min_stop_pct)) * F.col("total_tokens")
    ).select(F.col("domain").alias(domain_col))
    return df.join(F.broadcast(keep), domain_col, "inner")


def novelty_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document novelty: how much of a doc's n-gram vocabulary
    appears NOWHERE else in the corpus. Emits ``n_grams`` (the doc's
    distinct n-gram count) and ``n_unique`` (those with corpus
    document-frequency 1) — integer numerator/denominator of the
    novelty ratio, the memorization-risk / boilerplate signal dual to
    ``repetition_stats`` (which looks within a doc, this looks across
    the corpus).

    Zero joins on the gram axis (q109's trick): the df=1 owner is
    recovered as ``min(id)`` inside the single gram groupBy, so the
    corpus text is scanned once and exploded once; per-doc totals come
    from a doc groupBy of the same exploded set. The only joins are
    doc-keyed (totals and unique counts back onto the pruned id column)
    and carry at most one row per doc.
    """
    from striot_spark.functions.dedup import shingles

    # ONE scan + ONE shingle pass: every per-doc stat derives from the
    # single distinct-(doc, gram) explode — totals are grams.groupBy(id)
    # (not a second size() projection, which would re-scan and re-shingle
    # the whole corpus), and the final doc-keyed joins touch only the
    # pruned id column of the base table.
    grams = scatter(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
            "gram"
        ),
    )
    tot = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    uniq = (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min(F.col(id_col)).alias("owner"),
        )
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return (
        df.select(id_col)
        .join(tot, id_col, "left")
        .join(uniq, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("int").alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias(
                "n_unique"
            ),
        )
    )


def positional_postings(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """POSITIONAL posting lists (term, doc, pos) — the index shape
    phrase/proximity queries serve from, extending ``posting_lists``
    (which keeps only doc membership) with in-document positions. One
    posexplode projection, zero shuffles at build time; at serving
    scale this table is written bucketed by term so every phrase
    join below is co-located."""
    # filter empties BEFORE positions are assigned (nonempty_tokens),
    # not after: a post-explode filter would leave gaps in `pos` and
    # silently break consecutive-position phrase joins on texts with
    # repeated separators
    return df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(nonempty_tokens(F.col(text_col))).alias(
            "pos", "term"
        ),
    )


def phrase_search(
    postings: DataFrame, phrases, id_col: str = "doc"
) -> DataFrame:
    """EXACT phrase search over a positional postings table: for each
    phrase, the documents containing its tokens at consecutive
    positions, with the occurrence count — the retrieval primitive
    bag-of-words scoring (``lexical_search``) cannot express
    ("customer join" must not match "join customer").

    Lowering: each phrase token i filters the postings to its own
    occurrences and normalizes position to the would-be phrase START
    (pos - i); a k-token phrase is then k-1 EQUI-joins on (doc,
    start) — a start position surviving all joins is one exact
    occurrence. The join inputs are term-occurrence-sized (the term
    filter pushes to the index scan), never corpus-sized, and every
    join is keyed — the standard positional-intersection evaluation
    of inverted indexes (Manning et al., IR, ch. 2). Output:
    (phrase_id, doc, n_matches), one row per matching document per
    phrase.
    """
    from functools import reduce as _reduce

    outs = []
    for pid, phrase in enumerate(phrases):
        toks = phrase.split() if isinstance(phrase, str) else list(phrase)
        if not toks:
            raise ValueError("phrase_search: empty phrase")
        m = None
        for i, w in enumerate(toks):
            p_i = postings.filter(F.col("term") == w).select(
                F.col(id_col), (F.col("pos") - F.lit(i)).alias("__start")
            )
            m = p_i if m is None else m.join(p_i, [id_col, "__start"])
        cnt = m.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_matches")
        )
        outs.append(
            cnt.select(
                F.lit(pid).cast("long").alias("phrase_id"),
                F.col(id_col),
                F.col("n_matches"),
            )
        )
    return _reduce(lambda a, b: a.unionByName(b), outs)


def posting_lists(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Inverted-index build: per token, the document frequency plus the
    first ``k`` doc ids in ascending order as the posting-list head —
    the search-index / retrieval-side view of a corpus.

    Scale lowering: per-document token dedup happens IN-ROW
    (array_distinct before the explode — a pairwise .distinct() would
    cost its own (doc, token) shuffle), so the whole build is ONE
    shuffle by token that the rank window, the df window and the
    final groupBy all reuse (superset keys, no second Exchange). df
    comes from a partition-wide window count and the posting head from
    a rank filter BEFORE collect_list — per-group state is bounded by
    k, so a stop-word token with a billion postings never buffers more
    than k ids anywhere. Posting head emitted as a comma-joined string
    (engine-portable, hash-stable).
    """
    from pyspark.sql import Window as W

    pairs = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(tokens_col(F.col(text_col)))
        ).alias("token"),
    ).filter(F.col("token") != "")
    w_rank = W.partitionBy("token").orderBy(F.col("doc").asc())
    w_all = W.partitionBy("token")
    ranked = pairs.withColumn(
        "rnk", F.row_number().over(w_rank)
    ).withColumn("df_ct", F.count(F.lit(1)).over(w_all))
    return (
        ranked.filter(F.col("rnk") <= k)
        .groupBy("token", "df_ct")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("doc"))), ","
            ).alias("postings")
        )
    )


def collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Collocation mining: the top-k adjacent-token bigrams by a
    scaled integer PMI proxy ``(nab * N * 10000) DIV (na * nb)`` (N = corpus tokens) —
    the phrase-detection / tokenizer-merge statistic (public
    methodology: Mikolov et al. 2013 word2vec phrase scoring), kept in
    integers so the ranking is engine-exact. Headroom: the proxy
    needs ``nab * N * 10000 < 2^63``; corpora past ~10^9 tokens should
    move the score to decimal(38,0) (the ``dedup_groups`` pattern) —
    counts themselves never overflow.

    Lowering: bigrams are formed IN-ROW (zip_with of the token array
    against its own shift — no self-join, no positional explode
    round-trip), so the corpus is scanned once and shuffled only as
    (w1, w2) count partials with map-side combine. Unigram counts are
    vocabulary-sized and broadcast back onto the bigram table (two
    BHJs, plan-gated); the min-count filter runs before the joins so
    the scored table is heavy-bigrams only. Top-k via the TakeOrdered
    path under a total (score, nab, w1, w2) order.
    """
    sel = df.select(nonempty_tokens(F.col(text_col)).alias("tk"))
    toks = sel.select(F.explode(F.col("tk")).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    bg = sel.select(
        F.explode(
            F.zip_with(
                # greatest(0, ...) guards empty/1-token docs: slice()
                # throws on a negative length at runtime
                F.expr("slice(tk, 1, greatest(0, size(tk) - 1))"),
                F.expr("slice(tk, 2, greatest(0, size(tk) - 1))"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= min_count)
    )
    scored = (
        bc.join(
            F.broadcast(
                uni.select(F.col("tok").alias("w1"), F.col("n").alias("na"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.select(F.col("tok").alias("w2"), F.col("n").alias("nb"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "nab",
            "na",
            "nb",
            F.expr("(nab * n_total * 10000) DIV (na * nb)").alias("score"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(),
        F.col("nab").desc(),
        F.col("w1").asc(),
        F.col("w2").asc(),
    ).limit(k)


def lexical_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_tokens: Sequence[str],
    k: int = 10,
) -> DataFrame:
    """Lexical retrieval: score every document against a (small) query
    token set with integer tf-idf weighting
    ``score = Σ_t tf(t, doc) * (N_docs DIV df(t))`` and return the
    top-k — a BM25-shaped ranking kept in integers so it is
    engine-exact (the idf is the integer rarity ratio; log-shaping
    changes ordering only across extreme df gaps, which DIV preserves
    directionally).

    Two-pass lowering: pass 1 computes N_docs AND the query tokens'
    dfs in ONE corpus scan (in-row membership columns folded into a
    single aggregate — at serving scale this lookup comes from the
    q170 posting-list index instead), collected into literal weights;
    pass 2
    scores as a PURE PROJECTION (per-token in-row tf counts times
    literal weights — zero joins, zero shuffles) with TakeOrdered
    top-k under the (score, id) total order. The corpus is never
    joined or shuffled.
    """
    toks = nonempty_tokens(F.col(text_col))
    qlist = list(query_tokens)
    if not qlist:
        # an empty query matches nothing (score would otherwise stay
        # None and crash on .alias); emit the empty result with the
        # contract schema
        return df.select(
            F.col(id_col), F.lit(0).cast("long").alias("score")
        ).limit(0)
    df_counts = df.select(
        *[
            F.array_contains(toks, F.lit(t)).cast("long").alias(f"__c{i}")
            for i, t in enumerate(qlist)
        ]
    ).agg(
        F.count(F.lit(1)).alias("__n_docs"),
        *[F.sum(f"__c{i}").alias(f"df{i}") for i in range(len(qlist))],
    )
    dfs = df_counts.collect()[0]
    n_docs = int(dfs["__n_docs"])
    weights = [
        n_docs // int(dfs[f"df{i}"]) if int(dfs[f"df{i}"]) > 0 else 0
        for i in range(len(qlist))
    ]
    def _tf(tok: str) -> Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(tok)))

    tf = [_tf(t) for t in qlist]
    score = None
    for tf_i, w in zip(tf, weights):
        term = tf_i.cast("long") * F.lit(int(w))
        score = term if score is None else score + term
    scored = df.select(
        F.col(id_col), score.alias("score")
    ).filter(F.col("score") > 0)
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def compression_ratio_pm(text: Column) -> Column:
    """Per-document zlib compression ratio in integer permille
    (compressed_bytes * 1000 DIV raw_bytes) — the classic
    repetitiveness/boilerplate quality signal (RefinedWeb-style
    filtering, public methodology): template farms and keyword-stuffed
    spam compress far below natural prose.

    This is the repo's one SCALAR ``@pandas_udf``: a true byte-level
    compressor is genuinely inexpressible in SQL/Column algebra, so
    the vectorized-Arrow UDF path is the right tool — batches arrive
    as pandas Series (Arrow transfer, ~10-100x the throughput of a
    row-at-a-time Python UDF), the loop below is per-batch Python over
    the C zlib. Deterministic for a fixed zlib (level 6 pinned), but
    NOT SQL-reproducible — the demonstrating query is registered
    rows-only, the documented contract for genuinely non-SQL ops.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 0
            return len(zlib.compress(raw, 6)) * 1000 // len(raw)

        return s.map(one)

    return _ratio(text)



def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_tokens: Sequence[str],
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> DataFrame:
    """True BM25 retrieval (Robertson & Walker's Okapi weighting,
    public methodology) in EXACT integer arithmetic — adds the
    length-normalized tf SATURATION that ``lexical_search``'s plain
    tf * idf ranking lacks:

        score      = Σ_t  idf_milli(t) * sat_ppm(t, doc)
        sat_ppm    = tf * (k1_milli + 1000) * 1e6
                     DIV (tf * 1000 + (k1_milli * norm_milli) DIV 1000)
        norm_milli = (1000 - b_milli)
                     + b_milli * dl * N_docs DIV total_tokens
        idf_milli  = (N_docs - df + 1) * 1000 DIV (df + 1)

    with k1/b as milli-integers (defaults 1200/750 = the canonical
    1.2/0.75). ``dl * N DIV total_tokens`` is the doc-length ratio
    dl/avgdl with the average folded away, so no intermediate division
    loses precision. The idf is the RATIONAL Robertson idf without the
    log — a documented delta (like chopTime's alignment note): log is
    monotone, so each individual term's df-ordering is identical and
    only the relative weighting ACROSS terms differs (rare terms weigh
    more than log-BM25 would). Every operation is integer DIV, so the
    ranking is bit-identical across engines — a float log is not
    (q272's rationale).

    Headroom: sat_ppm < (k1_milli + 1000) * 1000 and idf_milli <=
    (N + 1) * 1000, so the summed score stays under 2^63 for
    N * |Q| up to ~4e9 doc-terms — ENFORCED below (ValueError, the
    module's guard policy) rather than silently wrapping.

    Same two-pass lowering as ``lexical_search``: pass 1 computes
    N_docs, total_tokens AND the query tokens' dfs in ONE corpus scan
    (a serving deployment reads the q170 posting-list index instead),
    inlined as literals; pass 2 scores as a PURE PROJECTION — zero
    joins, zero corpus shuffles — with TakeOrdered top-k under the
    (score DESC, id ASC) total order.
    """
    qlist = list(query_tokens)

    def _empty() -> DataFrame:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("dl"),
            F.lit(0).cast("long").alias("score"),
        ).limit(0)

    if not qlist:
        return _empty()
    n_docs, tot_tokens, dfs = bm25_corpus_stats(df, text_col, qlist)
    if n_docs == 0 or tot_tokens == 0:
        return _empty()
    if (n_docs + 1) * 1000 * (k1_milli + 1000) * 1000 * len(qlist) >= 2**63:
        raise ValueError(
            "bm25_search: n_docs * |query| exceeds exact-long scoring "
            "headroom - lower k1_milli or shrink the query"
        )
    dl_sql, score_sql = bm25_score_sql(
        text_col, qlist, dfs, n_docs, tot_tokens, k1_milli, b_milli
    )
    scored = df.select(
        F.col(id_col),
        F.expr(dl_sql).alias("dl"),
        F.expr(score_sql).alias("score"),
    ).filter(F.col("score") > 0)
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)


def bm25_score_sql(
    text_col: str,
    query_tokens: Sequence[str],
    dfs: Sequence[int],
    n_docs: int,
    tot_tokens: int,
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> tuple[str, str]:
    """Build the (dl, score) SQL expression pair of ``bm25_search``'s
    integer Okapi formula with the corpus stats as inlined literals —
    shared by the batch ranker and the streaming ingest-time scorer so
    the two compute the bit-identical score by construction.

    Tokens are interpolated into string literals, so each is escaped
    by doubling single quotes (ANSI, identical semantics in Spark and
    DuckDB); backslashes and control characters are REJECTED because
    their literal semantics differ between Spark's default parser
    (backslash-escapes) and ANSI engines — a silent dialect divergence,
    not an expressible token (ADVICE r12).

    Parameter validation (ADVICE r12): for tf=0 terms the saturation
    denominator reduces to (k1_milli * norm) DIV 1000, which is 0 when
    k1_milli * (1000 - b_milli) < 1000 — Spark's non-ANSI DIV then
    yields NULL and silently nulls the whole score. The guard below
    enforces k1_milli * max(1000 - b_milli, 1) >= 1000 so the
    denominator is provably positive for every tf >= 0 (norm >=
    1000 - b_milli always); b_milli = 1000 is rejected outright since
    norm can then reach 0 for below-average-length docs.
    """
    if not (1 <= k1_milli and 0 <= b_milli < 1000):
        raise ValueError(
            "bm25_score_sql: require k1_milli >= 1 and "
            f"0 <= b_milli < 1000, got k1_milli={k1_milli} "
            f"b_milli={b_milli}"
        )
    if k1_milli * (1000 - b_milli) < 1000:
        raise ValueError(
            "bm25_score_sql: k1_milli * (1000 - b_milli) must be "
            ">= 1000 or the tf=0 saturation denominator underflows "
            f"to 0 (integer DIV), got {k1_milli * (1000 - b_milli)}"
        )
    tok_sql = f"filter(split({text_col}, ' '), x -> x <> '')"
    dl_sql = f"CAST(size({tok_sql}) AS BIGINT)"
    norm_sql = (
        f"({1000 - b_milli} + {b_milli} * {dl_sql} * {n_docs} "
        f"DIV {tot_tokens})"
    )
    terms = []
    for t, dfi in zip(query_tokens, dfs):
        if "\\" in t or any(ord(c) < 0x20 for c in t):
            raise ValueError(
                "bm25_score_sql: query token contains a backslash or "
                f"control character (dialect-divergent literal): {t!r}"
            )
        lit = t.replace("'", "''")
        idf_milli = (n_docs - dfi + 1) * 1000 // (dfi + 1)
        tf_sql = (
            f"CAST(size(filter({tok_sql}, x -> x = '{lit}')) AS BIGINT)"
        )
        sat_sql = (
            f"({tf_sql} * {(k1_milli + 1000) * 1000000} "
            f"DIV ({tf_sql} * 1000 + ({k1_milli} * {norm_sql}) DIV 1000))"
        )
        terms.append(f"{sat_sql} * {idf_milli}")
    score_sql = "CAST(" + " + ".join(terms) + " AS BIGINT)"
    return dl_sql, score_sql


def bm25_corpus_stats(
    df: DataFrame,
    text_col: str,
    query_tokens: Sequence[str],
) -> tuple[int, int, list[int]]:
    """One-scan corpus statistics for BM25: (n_docs, total_tokens,
    per-query-token document frequencies) — the pass both the batch
    ranker and the streaming scorer run before inlining literals."""
    toks = nonempty_tokens(F.col(text_col))
    qlist = list(query_tokens)
    stats = df.select(
        F.size(toks).cast("long").alias("__dl"),
        *[
            F.array_contains(toks, F.lit(t)).cast("long").alias(f"__c{i}")
            for i, t in enumerate(qlist)
        ],
    ).agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("__dl").alias("__tot"),
        *[F.sum(f"__c{i}").alias(f"df{i}") for i in range(len(qlist))],
    )
    row = stats.collect()[0]
    return (
        int(row["__n_docs"]),
        int(row["__tot"] or 0),
        [int(row[f"df{i}"]) for i in range(len(qlist))],
    )
