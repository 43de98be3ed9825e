"""Text analysis: token statistics, quality scoring, language-ID heuristics,
document fingerprinting.

All built-in column expressions (regexp + length arithmetic) — the hot path
stays inside whole-stage codegen; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.mat import materialize

# tiny per-language stopword lists for the n-gram/stopword-density heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "a", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "que", "en"),
}


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


# character classes for translate()-based counting — a char-map deletion is
# a plain JVM lookup per character, far cheaper than running a regex engine
# over the corpus once per class (the old shape: 5 regexp_replace scans)
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_UPPER = _LETTERS[:26]
_DIGITS = "0123456789"
_PUNCT = ".,;:!?'\"()[]-"
_WS = " \t\n\x0b\f\r"  # Java regex \s


def _class_count(text: Column, chars: str) -> Column:
    """Occurrences of any character of ``chars`` in ``text`` — computed as
    length minus length-after-deleting, with translate() instead of a
    regexp_replace scan (same value, no regex engine in the loop)."""
    return F.length(text) - F.length(F.translate(text, chars, ""))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds token_cnt, char_cnt, avg_token_len, plus a BPE-ish subword count
    (alphanumeric runs + individual non-space symbols — a cheap proxy for
    tokenizer load)."""
    text = F.col(text_col)
    toks = F.size(_tokens(text))
    chars = F.length(text)
    # alnum runs + every non-space non-alnum char, counted without the
    # old lookaround split (which materialized a per-char array): one
    # regexp_count for the runs, translate arithmetic for the symbols
    subwords = (
        F.regexp_count(text, F.lit("[A-Za-z0-9]+"))
        + chars
        - _class_count(text, _LETTERS + _DIGITS)
        - _class_count(text, " ")
    )
    return df.withColumns(
        {
            "token_cnt": toks,
            "char_cnt": chars,
            "avg_token_len": F.when(toks > 0, chars / toks),
            "subword_cnt": subwords,
        }
    )


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds alpha_ratio, digit_ratio, punct_ratio, upper_ratio,
    whitespace_ratio and a composite quality_score in [0,1]."""
    text = F.col(text_col)
    n = F.length(text).cast("double")
    alpha = _class_count(text, _LETTERS) / n
    digit = _class_count(text, _DIGITS) / n
    punct = _class_count(text, _PUNCT) / n
    upper = _class_count(text, _UPPER) / n
    ws = _class_count(text, _WS) / n
    score = (
        F.least(alpha * 1.25, F.lit(1.0)) * 0.5
        + (1.0 - F.least(digit * 4, F.lit(1.0))) * 0.2
        + (1.0 - F.least(punct * 5, F.lit(1.0))) * 0.2
        + (1.0 - F.least(upper * 3, F.lit(1.0))) * 0.1
    )
    return df.withColumns(
        {
            "alpha_ratio": alpha,
            "digit_ratio": digit,
            "punct_ratio": punct,
            "upper_ratio": upper,
            "whitespace_ratio": ws,
            "quality_score": F.when(n > 0, score),
        }
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-density score per language + argmax guess (lang_guess).

    An n-gram-free heuristic: the language whose stopword list is densest
    in the token stream. Ties or all-zero → NULL guess."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    out = df
    score_cols = []
    for lang, words in STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
        col = f"score_{lang}"
        out = out.withColumn(col, F.when(n > 0, hits / n).otherwise(0.0))
        score_cols.append(col)
    best = F.greatest(*[F.col(c) for c in score_cols])
    guess = F.lit(None).cast("string")
    for lang in reversed(list(STOPWORDS)):
        guess = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return out.withColumn("lang_guess", guess)


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, public quality
    rules): ``dup_line_frac`` — fraction of lines that are duplicates of
    an earlier line; ``top_bigram_frac`` — share of the most frequent word
    bigram among all bigrams (boilerplate/spam detector).

    dup_line_frac is pure per-row array math. The bigram mode needs a
    per-(doc, bigram) count — explode → two map-side-combinable
    aggregations keyed by doc, so the shuffle carries one row per distinct
    (doc, bigram): corpus-linear, no corpus-wide key."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    )
    toks = _tokens(F.col(text_col))
    # zip_with pads the shorter side with NULL and concat_ws skips NULLs,
    # so the trailing element is a lone token — real bigrams are the
    # elements containing the separator space
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda s: s.contains(" "),
    )
    base = df.select(
        F.col(id_col), dup.alias("dup_line_frac"), bigrams.alias("_bg")
    )
    counts = (
        base.select(id_col, "dup_line_frac", F.size("_bg").alias("_n"),
                    F.explode_outer("_bg").alias("_b"))
        .groupBy(id_col, "dup_line_frac", "_n", "_b")
        .agg(F.count("_b").alias("_c"))
        .groupBy(id_col, "dup_line_frac", "_n")
        .agg(F.max("_c").alias("_top"))
    )
    top = F.when(
        F.col("_n") > 0, F.col("_top").cast("double") / F.col("_n")
    ).otherwise(F.lit(None))
    return counts.select(
        id_col, "dup_line_frac", top.alias("top_bigram_frac")
    )


def rolling_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document fingerprint: min rolling hash over token windows (winnowing
    lite) — stable under small edits away from the minimizing window.

    ``hash_fn``: "xxhash64" (fast, JVM-specific, fingerprint is a long) or
    "md5" (portable across engines — use when the fingerprint must be
    reproducible outside Spark; fingerprint is a hex string).

    Map-only: the rolling windows fold over the document's own token array
    (arrays_zip pads with nulls at the end and concat_ws skips them, so
    trailing windows shorten exactly like the lead()-with-nulls formulation
    this replaced — bit-identical output, minus that version's two
    shuffles). The ``window`` shifted copies are arrays_zip ARGUMENTS —
    each evaluated once — never expressions inside the lambda body, where
    an interpreted HOF would re-split the text once per window (O(tokens²)
    per document)."""
    toks = _tokens(F.col(text_col))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}") for i in range(window)]
    )
    wins = F.transform(
        zipped,
        lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(window)]),
    )
    pre = df.select(F.col(id_col), wins.alias("_wins"))
    hashed = F.transform(
        F.col("_wins"),
        # wrap xxhash64: HOF callables must expose a fixed 1-arg signature
        # (F.xxhash64's *cols signature is rejected by the lambda inspector)
        (lambda s: F.md5(s.cast("binary")))
        if hash_fn == "md5"
        else (lambda s: F.xxhash64(s)),
    )
    return pre.select(id_col, F.array_min(hashed).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every ``k``-token gram, slide a
    window of ``w`` consecutive gram hashes, and in each window select
    the MINIMUM hash, ties to the RIGHTMOST position (the paper's
    density rule). Guarantee (their Theorem): any token run shared
    between two documents of length >= ``w + k - 1`` contributes at
    least one IDENTICAL selected fingerprint to both — unlike the
    per-document global min (``rolling_fingerprint``), matches are
    LOCAL, so partial plagiarism/quotation is caught.

    Returns ``(id, pos, fp)`` — distinct selected fingerprints with the
    0-based gram position; ``fp`` is the engine-portable 60-bit integer
    md5 prefix of the gram text.

    Map-only: gram construction via the arrays_zip shift trick, the
    per-window rightmost-min via an integer aggregate fold over the
    in-row hash array (documents are row-sized), one distinct-explode.
    Expected density is 2/(w+1) selections per gram (paper §4), so the
    output is a constant fraction of the token stream at any corpus
    size; no shuffle until the caller aggregates."""
    toks = _tokens(F.col(text_col))
    zipped = F.arrays_zip(
        *[
            F.slice(toks, i + 1, F.greatest(F.size(toks), F.lit(1))).alias(
                f"t{i}"
            )
            for i in range(k)
        ]
    )
    grams = F.slice(
        F.transform(
            zipped,
            lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(k)]),
        ),
        1,
        F.greatest(F.size(toks) - (k - 1), F.lit(0)),
    )
    hashed = F.transform(
        grams,
        lambda g: F.conv(
            F.substring(F.md5(g.cast("binary")), 1, 15), 16, 10
        ).cast("long"),
    )
    pre = df.select(F.col(id_col), hashed.alias("_hs"))
    # rightmost-min per window: fold offsets 0..w-1 carrying the best
    # (hash, pos); `<=` lets later (righter) positions win ties. 2^60 is
    # above every 60-bit hash, so the seed always loses.
    sel = F.expr(
        f"CASE WHEN size(_hs) >= {w} THEN array_distinct(transform("
        f" sequence(0, size(_hs) - {w}), i -> aggregate(sequence(0, {w - 1}),"
        " named_struct('fp', 1152921504606846976L, 'pos', -1L),"
        " (acc, j) -> CASE WHEN _hs[i + j] <= acc.fp"
        " THEN named_struct('fp', _hs[i + j], 'pos', CAST(i + j AS BIGINT))"
        " ELSE acc END))) ELSE array() END"
    )
    return (
        pre.select(F.col(id_col), F.explode(sel).alias("_s"))
        .select(id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp"))
    )


def _fp_overlap_pairs(
    fp: DataFrame, min_shared: int, max_fp_docs: int
) -> DataFrame:
    """MOSS match report over a distinct ``(doc_id, fp)`` frame — the
    ONE implementation behind ``winnow_overlap`` (in-memory) and
    ``winnow_index_overlap`` (stored), so the cap/tie semantics cannot
    drift between them: fingerprints in more than ``max_fp_docs``
    documents are dropped BEFORE the self-join (boilerplate phrases —
    a hot fingerprint would square; the LSH hot-bucket cap discipline),
    then one (fp)-keyed join and a combinable pair count."""
    rare = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") <= max_fp_docs)
        .select("fp")
    )
    fpr = fp.join(rare, "fp")
    a = fpr.select(F.col("doc_id").alias("id_a"), "fp")
    b = fpr.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 3,
    max_fp_docs: int = 64,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    the MOSS match report. A fingerprint is evidence of a shared k-token
    run; several of them, of local plagiarism (each survives only if
    ALSO selected in the other document, so this under-counts relative
    to raw k-gram intersection — that selectivity is the point).
    Returns ``(id_a, id_b, n_shared)`` with id_a < id_b; cap/join shape
    in ``_fp_overlap_pairs``."""
    # materialized once: the overlap core consumes the fingerprint frame
    # three times (rarity count + both self-join sides), and each would
    # re-run the rolling-hash winnowing pass; the index-backed variant
    # (winnow_index_overlap) reads parquet instead and needs no barrier
    fp = winnow_fingerprints(df, id_col, text_col, k, w).select(
        F.col(id_col).alias("doc_id"), "fp"
    ).distinct().transform(materialize)
    return _fp_overlap_pairs(fp, min_shared, max_fp_docs)


def ngram_f1_pairs(
    pairs: DataFrame,
    n: int = 2,
    id_a: str = "id_a",
    text_a: str = "text_a",
    id_b: str = "id_b",
    text_b: str = "text_b",
) -> DataFrame:
    """Clipped n-gram overlap P/R/F1 per text pair — the ROUGE-n recall
    / BLEU-n modified-precision mechanism (Lin 2004; Papineni et al.
    2002): a shared gram counts min(count_a, count_b) times, so
    repeating a phrase cannot inflate the score. The eval-similarity
    metric curation uses to SCORE suspected near-dups and
    benchmark-contamination candidates, where the dedup tier only
    detects them.

    precision = match / grams_a, recall = match / grams_b,
    f1 = 2PR/(P+R); a side with no grams (or no overlap) scores 0 —
    documented convention. All counts are exact integers; each final
    division is one correctly-rounded float op, so the scores
    hash-gate.

    PRECONDITION: one row per (id_a, id_b) — gram counts key on the id
    pair, so two rows sharing ids (several candidate spans for the same
    doc pair) would merge their gram multisets into a score for a pair
    of texts that exists nowhere; dedup (or re-key with a span id)
    before calling.

    Shape at scale: one gram pass over the pairs frame — both sides'
    grams explode tagged in a single projection, ONE map-side-
    combinable (pair, gram) aggregate carries both counts, ONE (pair)
    aggregate folds the clipped match and totals together (no per-side
    re-evaluation, no gram-keyed join; the id-only `base` projection
    re-reads the pairs source once more for zero-gram pairs). Nothing
    is quadratic in the corpus — the caller supplies the pairs (from
    LSH/fingerprint candidates)."""
    key = [F.col(id_a), F.col(id_b)]
    # token arrays are PROJECTED once per side before the gram transform:
    # an interpreted HOF re-runs its lambda per element, so a split()
    # expression referenced inside the lambda would re-tokenize the text
    # once per gram position — O(tokens²) per document (the same rule
    # _shingle_array documents)
    pre = pairs.select(
        *key,
        _tokens(F.col(text_a)).alias("_tka"),
        _tokens(F.col(text_b)).alias("_tkb"),
    )

    def grams(tok_col: str) -> Column:
        toks = F.col(tok_col)
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array())

    tagged = F.concat(
        F.transform(
            grams("_tka"),
            lambda g: F.struct(F.lit(1).alias("a"), g.alias("g")),
        ),
        F.transform(
            grams("_tkb"),
            lambda g: F.struct(F.lit(0).alias("a"), g.alias("g")),
        ),
    )
    gc = (
        pre.select(*key, F.explode(tagged).alias("_t"))
        .groupBy(id_a, id_b, F.col("_t.g").alias("_g"))
        .agg(
            F.sum("_t.a").alias("_ca"),
            F.sum(1 - F.col("_t.a")).alias("_cb"),
        )
    )
    totals = gc.groupBy(id_a, id_b).agg(
        F.sum("_ca").cast("long").alias("ngrams_a"),
        F.sum("_cb").cast("long").alias("ngrams_b"),
        F.sum(F.least("_ca", "_cb")).cast("long").alias("n_match"),
    )
    base = pairs.select(id_a, id_b).distinct()
    out = base.join(totals, [id_a, id_b], "left").select(
        id_a,
        id_b,
        F.coalesce("ngrams_a", F.lit(0)).cast("long").alias("ngrams_a"),
        F.coalesce("ngrams_b", F.lit(0)).cast("long").alias("ngrams_b"),
        F.coalesce("n_match", F.lit(0)).cast("long").alias("n_match"),
    )
    p = F.when(
        F.col("ngrams_a") > 0, F.col("n_match") / F.col("ngrams_a")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("ngrams_b") > 0, F.col("n_match") / F.col("ngrams_b")
    ).otherwise(F.lit(0.0))
    return out.select(
        "*",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(
            F.when(F.col("n_match") > 0, 2 * p * r / (p + r)).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("f1"),
    )


def source_kl_divergence(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    quantize: int = 6,
) -> DataFrame:
    """Per-group unigram KL divergence from the whole corpus,
    KL(P_group || P_corpus) — the domain-drift / mixture-shift monitor
    (the quantity DoReMi-style reweighting and CCNet's domain filters
    read): 0 for a group distributed like the corpus, growing as its
    vocabulary usage departs.

    Laplace-smoothed over the CORPUS vocabulary V on both sides:
    p_g(t) = (c_t+1)/(n_g+|V|), p_c(t) = (C_t+1)/(N+|V|). Every log is
    the corpus integer-log convention L(x) = round(ln(x)*10^q) of an
    exact INTEGER argument (the same micro-nat quantization as
    ``unigram_logprob`` — summation stays integer, hence
    order-independent), and the sum over tokens ABSENT from the group
    collapses in closed form (c_t = 0 ⇒ weight 1, L(1) = 0):

      (n_g+|V|) * KL * 10^q =
          Σ_{t∈G} (c_t+1)(L(c_t+1) − B_g − L(C_t+1) + B_c)
        + (|V|−|G|)(B_c − B_g) + (T − Σ_{t∈G} L(C_t+1) ) * (−1)

    with B_g = L(n_g+|V|), B_c = L(N+|V|), T = Σ_{t∈V} L(C_t+1) — two
    scalar broadcasts plus one (group, token)-keyed join against the
    vocabulary. No |V| × groups blow-up: groups only pay for tokens
    they actually contain.

    Returns ``(group, n_tokens, vocab_overlap, kl_micro, kl)`` with
    ``kl_micro`` the exact integer numerator (micro-nats scaled by
    (n_g+|V|)) and ``kl`` the rounded double."""
    q = 10**quantize
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    # gcnt feeds the corpus rollup (ccnt), the per-group totals (gtot)
    # AND the scoring join side — materialize it once (it is exactly the
    # frame the (grp, tok) aggregation shuffle already moves) so the
    # corpus tokenize+explode pass does not re-run per consumer
    gcnt = (
        tok.groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(materialize)
    )
    # every occurrence belongs to exactly one group, so the corpus
    # counts are a token-level rollup of gcnt — ONE corpus tokenize
    # pass, not two
    ccnt = gcnt.groupBy("tok").agg(F.sum("c").alias("cc"))

    def L(x):
        # the corpus micro-nat convention (runtime ln of an exact
        # integer, like unigram_logprob/dsir) — data-dependent args, so
        # the _ndcg_discounts precompute trick does not apply here
        return F.round(F.log(x.cast("double")) * q).cast("long")

    consts = ccnt.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cc").alias("n_corpus"),
        F.sum(L(F.col("cc") + 1)).alias("t_all"),
    )
    gtot = gcnt.groupBy("grp").agg(
        F.sum("c").alias("n_g"), F.count(F.lit(1)).alias("g_vocab")
    )
    joined = (
        gcnt.join(ccnt, "tok")
        .join(F.broadcast(gtot), "grp")
        .join(F.broadcast(consts))
    )
    bg = L(F.col("n_g") + F.col("v"))
    bc = L(F.col("n_corpus") + F.col("v"))
    # DECIMAL(38,0) through the sum: a group of ~3e11+ tokens would wrap
    # the int64 term product ((c+1) ~ 1e12 times ~3e7 micro-nats) — the
    # same overflow discipline as opq_dim_allocation's variances. The
    # exposed kl_micro stays BIGINT (exact for any group whose value
    # fits; `kl` is the scale-stable output).
    present = joined.groupBy(
        "grp", "n_g", "g_vocab", "v", "n_corpus", "t_all"
    ).agg(
        F.sum(
            (F.col("c") + 1).cast("decimal(38,0)")
            * (
                L(F.col("c") + 1) - bg - L(F.col("cc") + 1) + bc
            ).cast("decimal(38,0)")
        ).alias("_p"),
        F.sum(L(F.col("cc") + 1).cast("decimal(38,0)")).alias(
            "_lc_present"
        ),
    )
    kl_micro = (
        F.col("_p")
        + (
            (F.col("v") - F.col("g_vocab")) * (bc - bg)
        ).cast("decimal(38,0)")
        - (F.col("t_all").cast("decimal(38,0)") - F.col("_lc_present"))
    )
    return present.select(
        F.col("grp").alias(group_col),
        F.col("n_g").cast("long").alias("n_tokens"),
        F.col("g_vocab").cast("long").alias("vocab_overlap"),
        kl_micro.cast("long").alias("kl_micro"),
        F.round(
            kl_micro.cast("double") / q / (F.col("n_g") + F.col("v")), 6
        ).alias("kl"),
    )


def write_winnow_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> None:
    """Persist the winnowing fingerprint frame (distinct (id, fp)) for
    append-only plagiarism/overlap maintenance. Winnowing is strictly
    per-document, so the merge law is plain set UNION — an append
    fingerprints ONLY the new batch (the point of the index: a batch
    against a 100 TB corpus costs the batch's fingerprints plus one
    fp-keyed join, never a corpus rescan). Plain parquet appends here;
    production writes go through a transactional commit (see
    sources.store's manifest-snapshot pattern)."""
    winnow_fingerprints(docs, id_col, text_col, k, w).select(
        F.col(id_col).alias("doc_id"), "fp"
    ).distinct().write.mode("overwrite").parquet(f"{path}/fps")


def append_winnow_index(
    batch: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> None:
    """Fingerprint the batch only and append to the stored frame."""
    winnow_fingerprints(batch, id_col, text_col, k, w).select(
        F.col(id_col).alias("doc_id"), "fp"
    ).distinct().write.mode("append").parquet(f"{path}/fps")


def winnow_index_overlap(
    spark,
    path: str,
    min_shared: int = 3,
    max_fp_docs: int = 64,
) -> DataFrame:
    """MOSS match report straight off the STORED fingerprints — no
    corpus access. Identical semantics to the one-shot
    ``winnow_overlap`` BY CONSTRUCTION (both call
    ``_fp_overlap_pairs``); because winnowing has no cross-document
    state, index-then-append equals the one-shot EXACTLY for any batch
    split (the set-union merge law)."""
    fp = spark.read.parquet(f"{path}/fps").distinct()
    return _fp_overlap_pairs(fp, min_shared, max_fp_docs)


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantize: int | None = 6,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the classic cheap perplexity proxy for quality
    filtering (CCNet / Gopher use a trained LM; the self-trained unigram
    is the shuffle-shape-identical seed of that pipeline). Lower (more
    negative) = rarer words = more likely junk/noise.

    Shape at scale: one word-count aggregation over the corpus (map-side
    combinable — the canonical wordcount), one scalar total broadcast,
    and one shuffle join of per-(doc, token) counts against the
    vocabulary keyed by token. Every stage is corpus-linear; no
    collect, no global window.

    ``quantize`` snaps each token's logprob to 10^-quantize units held as
    an INTEGER, so the per-doc weighted mean is exact integer arithmetic —
    associative, hence identical under any aggregation order / partitioning
    (a float mean moves in its last ulp with the order, which a value-hash
    gate cannot tolerate). None keeps full floats.
    """
    tok = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    # per-(doc, token) multiplicity first: the vocab join then carries one
    # row per distinct doc-token, not one per token occurrence. The vocab
    # derives FROM doc_tok (sum of multiplicities) — map-side-combinable
    # both hops. The corpus is scanned once per join side (cheap columnar
    # re-read) rather than computing cnt with a per-token window: a window
    # partitioned by token puts every ("the", doc) row in ONE partition —
    # unbounded skew at corpus scale — while the join side lets AQE
    # broadcast the vocabulary. The scalar total needs no explode at all —
    # a map-only size(tokens) sum over the raw text column.
    # doc_tok feeds the vocabulary aggregate AND the scoring join —
    # materialize it once (it is the frame the aggregation shuffle
    # already moves) so the token explode does not run per consumer
    doc_tok = (
        tok.groupBy(id_col, "tok")
        .agg(F.count("*").alias("m"))
        .transform(materialize)
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("m").alias("cnt"))
    total = df.agg(
        F.sum(F.size(_tokens(F.col(text_col)))).alias("n_total")
    )
    lp = F.log(F.col("cnt").cast("double") / F.col("n_total"))
    joined = doc_tok.join(vocab, "tok").crossJoin(F.broadcast(total))
    if quantize is not None:
        scale = float(10 ** quantize)
        lpq = F.round(lp * scale).cast("long")
        mean = (F.sum(F.col("m") * lpq) / F.sum("m")) / F.lit(scale)
    else:
        mean = F.sum(F.col("m") * lp) / F.sum("m")
    return joined.groupBy(id_col).agg(
        mean.alias("unigram_logprob"),
        F.sum("m").alias("token_cnt"),
    )


# the GPT-2 pre-tokenizer rule (Radford et al. 2019, regex from the
# released encoder), restricted to ASCII classes and with the trailing
# lookahead branch dropped so the SAME pattern is leftmost-first valid in
# both Java regex and RE2 (DuckDB) — contractions, an optionally
# space-prefixed letter run / digit run / punctuation run, then
# whitespace runs
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer-shaped counting: how many pieces a BPE-family tokenizer's
    PRE-tokenizer would split each document into, next to the whitespace
    count — the standard pair for token-budget planning and for the
    chars-per-token compression signal (boilerplate and non-linguistic
    noise compress worse). Vocabulary merges only ever SPLIT these pieces
    further, so ``bpe_tokens`` is the exact lower bound (and the empirical
    ~0.75x proxy) of the real BPE count without shipping a merges file.

    Map-only: two regexp_count projections over the scan, no shuffle; at
    100 TB this is a pure weak-scaling stage like ``token_stats``.
    """
    txt = F.col(text_col)
    bpe = F.regexp_count(txt, F.lit(BPE_SPLIT_PATTERN))
    ws = F.size(F.filter(_tokens(txt), lambda t: t != ""))
    return df.select(
        F.col(id_col),
        bpe.cast("long").alias("bpe_tokens"),
        ws.cast("long").alias("ws_tokens"),
        F.when(
            bpe > 0, F.round(F.length(txt).cast("double") / bpe, 6)
        ).alias("chars_per_token"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    quantize: int | None = 6,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability under the
    corpus's own counts — the next rung of the perplexity-proxy ladder
    above ``unigram_logprob`` (CCNet filters on a trained 5-gram LM; the
    self-trained interpolated bigram is its shuffle-shape-identical
    2-gram seed):

        P(w2 | w1) = lam * c(w1 w2)/c(w1) + (1 - lam) * c(w2)/N

    Lower (more negative) = less corpus-predictable word transitions —
    shuffled/templated junk scores low even when every WORD is common
    (which the unigram score cannot see). ``lam=0.75`` is exact in
    binary, keeping the arithmetic engine-portable.

    Shape at scale: bigrams are built per document inside the scan
    (zip_with shifted slices), then the same corpus-linear pattern as
    unigram_logprob — (doc, bigram) multiplicities, a bigram-count join,
    two unigram-count joins, a broadcast scalar total; every aggregation
    is map-side combinable, integer-quantized for order-independence.
    Documents with fewer than two tokens have no bigram and are absent
    from the output (they carry no transition signal).
    """
    toks = _tokens(F.col(text_col))
    pairs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda x: x["w2"].isNotNull(),
    )
    bg = df.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    # db feeds the bigram-count aggregate AND the scoring join; uc feeds
    # both unigram join sides — materialize each once (see kneser_ney)
    db = (
        bg.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
        .transform(materialize)
    )
    bc = db.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))
    tok = df.select(F.explode(toks).alias("tok"))
    uc = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cu"))
        .transform(materialize)
    )
    total = df.agg(F.sum(F.size(toks)).alias("n_total"))
    u1 = uc.select(F.col("tok").alias("w1"), F.col("cu").alias("cu1"))
    u2 = uc.select(F.col("tok").alias("w2"), F.col("cu").alias("cu2"))
    joined = (
        db.join(bc, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
    )
    lp = F.log(
        F.lit(lam) * (F.col("cb").cast("double") / F.col("cu1"))
        + F.lit(1.0 - lam) * (F.col("cu2").cast("double") / F.col("n_total"))
    )
    if quantize is not None:
        scale = float(10 ** quantize)
        lpq = F.round(lp * scale).cast("long")
        mean = (F.sum(F.col("m") * lpq) / F.sum("m")) / F.lit(scale)
    else:
        mean = F.sum(F.col("m") * lp) / F.sum("m")
    return joined.groupBy(id_col).agg(
        mean.alias("bigram_logprob"),
        F.sum("m").alias("bigram_cnt"),
    )


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The FULL Gopher repetition-rule table (Rae et al. 2021, Table A1)
    over token n-grams: ``top{2,3,4}_frac`` — the share of n-gram
    positions taken by the single most frequent n-gram — and
    ``dup{5..10}_frac`` — the share of n-gram positions whose n-gram
    occurs more than once in the document. The published filter drops a
    document when e.g. top2 > 0.20, top3 > 0.18, top4 > 0.16,
    dup5 > 0.15 ... dup10 > 0.10 (thresholds are the caller's policy;
    this emits the measurements).

    Shape at scale: all nine n-gram families are built per document
    inside the scan (arrays_zip shifted slices, tagged with their n) and
    leave through ONE explode into a (doc, n, gram) count — two map-side
    combinable aggregations keyed by the document; no corpus-wide key
    ever forms, so skew is bounded by document length.
    """
    # tokenize ONCE into a projected column: the nine gram families
    # reference the token array ~60 times (arrays_zip args, slice
    # bounds), and an inline split() expression would re-tokenize the
    # document at every reference — a column ref is a plain array read
    pre = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_tk"))
    toks = F.col("_tk")

    def grams(n: int):
        zipped = F.arrays_zip(
            *[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}") for i in range(n)]
        )
        full = F.transform(
            F.slice(zipped, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(n)]),
        )
        return F.transform(full, lambda g: F.concat(F.lit(f"{n}:"), g))

    all_grams = F.concat(*[grams(n) for n in range(2, 11)])
    exploded = pre.select(F.col(id_col), F.explode(all_grams).alias("_g")).select(
        id_col,
        F.substring_index("_g", ":", 1).cast("int").alias("_n"),
        F.col("_g").alias("_gram"),
    )
    per_gram = exploded.groupBy(id_col, "_n", "_gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_n = per_gram.groupBy(id_col, "_n").agg(
        F.max("_c").alias("_top"),
        F.sum("_c").alias("_tot"),
        F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(F.lit(0))).alias(
            "_dup"
        ),
    )
    top = F.round(F.col("_top").cast("double") / F.col("_tot"), 6)
    dup = F.round(F.col("_dup").cast("double") / F.col("_tot"), 6)
    cols = {}
    for n in (2, 3, 4):
        cols[f"top{n}_frac"] = F.max(F.when(F.col("_n") == n, top))
    for n in range(5, 11):
        cols[f"dup{n}_frac"] = F.max(F.when(F.col("_n") == n, dup))
    return per_n.groupBy(id_col).agg(
        *[v.alias(k) for k, v in cols.items()]
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    cache_scores: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020 §4.3):
    documents are split into terciles of language-model score — CCNet
    trains a 5-gram LM on Wikipedia; here the default scorer is the
    self-trained interpolated bigram LM (``bigram_logprob``), and any
    precomputed score column can be passed instead (``score_col``).

    ``head`` = most corpus-predictable third (lowest perplexity =
    highest mean log-prob), ``tail`` = least. Returns
    ``(id, score, ppl_bucket)``.

    Shape at scale: the two tercile cutoffs are ONE exact-percentile
    aggregate (two scalars, map-side combinable sketch-free percentile is
    a full sort-based agg in Spark — still a single reduce to 1 row),
    broadcast back across the corpus as literals; no global sort, no
    window, no per-row shuffle beyond the scorer's own. The scored frame
    feeds BOTH the cutoff aggregate and the final compare, and Spark does
    not reuse the exchange across a broadcast boundary — without caching
    the bigram scorer would run twice (two full corpus reads).
    ``cache_scores`` persists the doc-sized (id, score) frame instead:
    ~16 bytes/doc, orders of magnitude smaller than the corpus it came
    from, so the corpus is scanned exactly once.
    """
    if score_col is None:
        scored = bigram_logprob(df, id_col=id_col, text_col=text_col).select(
            F.col(id_col),
            F.round("bigram_logprob", 6).alias("score"),
        )
        if cache_scores:
            from pyspark import StorageLevel

            scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        scored = df.select(F.col(id_col), F.col(score_col).alias("score"))
    cuts = scored.agg(
        F.percentile(F.col("score"), F.lit(1.0 / 3.0)).alias("_c1"),
        F.percentile(F.col("score"), F.lit(2.0 / 3.0)).alias("_c2"),
    )
    bucket = (
        F.when(F.col("score") >= F.col("_c2"), F.lit("head"))
        .when(F.col("score") >= F.col("_c1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col), "score", bucket.alias("ppl_bucket")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the standard keyword /
    topic-signal extraction over a corpus (Salton & Buckley 1988 tf-idf
    weighting, smoothed idf = ln((N + 1) / (df + 1))).

    The idf is integer-quantized (1e-6) before the tf multiply, so scores
    are exact integers: ranking is bit-deterministic across engines and
    partitionings, with ties broken by term string. Returns
    ``(id, rank, term, tf, tfidf)``.

    Shape at scale: one token explode → (doc, term) counts (map-side
    combine) → a term-keyed join against the vocabulary-sized df-count
    frame (AQE broadcasts it when small; genuinely large vocabularies
    shuffle on the term — the only corpus-sized exchange) → a per-doc
    window for the top-k (per-key state only).
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    # materialized once: tf feeds both the df-count aggregate and the
    # scoring join (each consumer otherwise re-runs the corpus explode)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    idf_q = F.round(
        F.log((F.col("_n") + 1).cast("double") / (F.col("_df") + 1)) * 1e6
    ).cast("long")
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            (F.col("tf") * idf_q).alias("_s"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_s").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "rank",
            "term",
            "tf",
            F.round(F.col("_s") / 1e6, 6).alias("tfidf"),
        )
    )


def hashed_nb_classify(
    df: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    persist: bool = True,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """Hashed multinomial Naive Bayes — the fasttext-shaped linear text
    classifier every curation pipeline runs for language ID / quality
    gating (CCNet trains fasttext; the inference shape is identical:
    hash tokens into a fixed feature table, sum per-class weights,
    argmax). Trained ON the corpus labels and applied back to every
    document, so the model is real, not a frozen stand-in.

    Token buckets use the md5 featurization convention
    (``conv(md5('nb:'||tok)[:8], 16, 10) % n_buckets`` — the 'nb:' salt
    keeps this table independent of the ``hash_embed`` feature space).
    Class-conditional weights are Laplace-smoothed log-probabilities
    quantized to 1e-6 (``round(ln((c+1)/(tl+B)) * 1e6)`` as BIGINT), and
    per-document scores are INTEGER sums of those weights plus an equally
    quantized class prior — bit-deterministic across engines and
    partitionings; ties break to the lexicographically smallest label.

    Returns ``(id, label, pred, correct)`` per document.

    Shape at scale: one (doc, bucket) count shuffle (map-side combined);
    the model is a (labels x n_buckets)-bounded frame — KB-sized,
    explicitly broadcast; scoring is one per-doc aggregate over
    labels x doc-buckets and a per-doc argmax window over |labels| rows.
    Nothing corpus-quadratic; the model build is the only training scan.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("nb:"), F.col("_tok"))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    db = (
        df.select(F.col(id_col), F.explode(toks).alias("_tok"))
        .select(F.col(id_col), bucket.alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    if persist:
        # the (doc, distinct-bucket) frame feeds BOTH the model build and
        # the scoring scan, across broadcast boundaries Spark won't reuse
        # an exchange over (BASELINE.md lesson): without the persist the
        # corpus tokenize+explode — the expensive part at 100 TB — runs
        # once per consumer. It is the slimmest corpus-derived frame here
        # (<= min(doc_tokens, n_buckets) rows/doc of three integers);
        # callers producing many models pass unpersist_handle=[].
        from pyspark import StorageLevel

        db = db.persist(StorageLevel.MEMORY_AND_DISK)
        if unpersist_handle is not None:
            unpersist_handle.append(db)
    lab = df.select(F.col(id_col), F.col(label_col).alias("_lab"))
    # class-conditional token counts and totals (labels x buckets
    # bounded — KB-sized): materialized once because it feeds tl, model
    # and (via tl) prior, and each consumer otherwise re-runs the
    # corpus-sized db-join + aggregation
    lb = (
        db.join(lab, id_col)
        .groupBy("_lab", "_b")
        .agg(F.sum("_m").alias("_c"))
        .transform(materialize)
    )
    tl = lb.groupBy("_lab").agg(F.sum("_c").alias("_tl"))
    model = (
        lb.join(tl, "_lab")
        .select(
            "_lab",
            "_b",
            F.round(
                F.log((F.col("_c") + 1).cast("double") / (F.col("_tl") + n_buckets))
                * 1e6
            )
            .cast("long")
            .alias("_lq"),
        )
    )
    # per-label miss weight ln(1/(tl+B)) and prior ln(n_label/n_docs);
    # n_docs comes from the label-count aggregate itself (sum over the
    # handful of label rows) — NOT an eager df.count(), which would be a
    # third full corpus pass and would break lazy construction
    labcnt = lab.groupBy("_lab").agg(F.count(F.lit(1)).alias("_nl"))
    total = labcnt.agg(F.sum("_nl").alias("_n"))
    prior = (
        labcnt.crossJoin(F.broadcast(total))
        .join(tl, "_lab")
        .select(
            "_lab",
            "_tl",
            F.round(
                F.log(F.col("_nl").cast("double") / F.col("_n")) * 1e6
            )
            .cast("long")
            .alias("_pq"),
            F.round(
                F.log(F.lit(1.0) / (F.col("_tl") + n_buckets)) * 1e6
            )
            .cast("long")
            .alias("_missq"),
        )
    )
    scored = (
        db.crossJoin(F.broadcast(prior.select("_lab", "_pq", "_missq")))
        .join(F.broadcast(model), ["_lab", "_b"], "left")
        .groupBy(id_col, "_lab")
        .agg(
            (
                F.first("_pq")
                + F.sum(
                    F.col("_m") * F.coalesce(F.col("_lq"), F.col("_missq"))
                )
            ).alias("_score")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_score"), F.asc("_lab")
    )
    pred = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_lab").alias("pred"))
    )
    return (
        df.select(F.col(id_col), F.col(label_col).alias("label"))
        .join(pred, id_col, "left")
        .select(
            F.col(id_col),
            "label",
            "pred",
            F.when(F.col("pred") == F.col("label"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("correct"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 30,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent-bigram collocations by pointwise mutual
    information (Church & Hanks 1990): PMI = ln(c_ab * T / (c_a * c_b))
    over corpus-wide counts, with a ``min_count`` support floor so rare
    accidental pairs don't dominate (the classic PMI failure mode).

    The PMI is 1e-6-quantized from an all-BIGINT ratio, so ranking is
    bit-deterministic; ties break on the bigram string. Returns
    (bigram, pair_cnt, left_cnt, right_cnt, pmi).

    Shape at scale: one bigram explode + one token explode, both
    map-side-combined into vocabulary-sized count frames; the two
    unigram joins key on the vocabulary frames (never the corpus), and
    the top-k is an orderBy().limit() partial top-k, not a global sort.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("_t"))
    bi = (
        base.select(
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(F.col("_t"), i),
                            F.element_at(F.col("_t"), i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_count)
    )
    uni = (
        base.select(F.explode("_t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = uni.agg(F.sum("cnt").alias("t_tok"))
    scored = (
        bi.withColumn("_l", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("_r", F.split(F.col("bigram"), " ").getItem(1))
        .join(uni.select(F.col("term").alias("_l"), F.col("cnt").alias("left_cnt")), "_l")
        .join(uni.select(F.col("term").alias("_r"), F.col("cnt").alias("right_cnt")), "_r")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "pair_cnt",
            "left_cnt",
            "right_cnt",
            F.round(
                F.log(
                    (F.col("pair_cnt") * F.col("t_tok")).cast("double")
                    / (F.col("left_cnt") * F.col("right_cnt"))
                )
                * 1e6
            )
            .cast("long")
            .alias("_p"),
        )
    )
    return (
        scored.orderBy(F.col("_p").desc(), F.col("bigram").asc())
        .limit(k)
        .select(
            "bigram",
            "pair_cnt",
            "left_cnt",
            "right_cnt",
            F.round(F.col("_p") / 1e6, 6).alias("pmi"),
        )
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate against the corpus's own top-``vocab_size``
    words — the CCNet / fastText-prep "common-word coverage" filter: a
    document whose tokens are mostly absent from the frequent vocabulary
    is boilerplate, non-linguistic noise, or the wrong language for the
    corpus. Emits (doc, token_cnt, oov_cnt, oov_rate); the drop threshold
    is the caller's policy.

    The vocabulary boundary is deterministic: ties at rank ``vocab_size``
    break on the token string, so the same corpus always yields the same
    vocabulary (a value-hash gate cannot tolerate a frequency tie picking
    different words per run).

    Shape at scale: one word-count aggregation (map-side combinable), a
    vocab-sized ``limit`` that the optimizer keeps broadcast-sized, and a
    broadcast left join of per-(doc, token) multiplicities against it —
    the corpus never shuffles on a corpus-wide key, so skew is bounded by
    document length.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    doc_tok = (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    vocab = (
        doc_tok.groupBy("tok")
        .agg(F.sum("m").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_iv"))
    )
    joined = doc_tok.join(F.broadcast(vocab), "tok", "left")
    out = joined.groupBy(id_col).agg(
        F.sum("m").alias("token_cnt"),
        F.sum(F.when(F.col("_iv").isNull(), F.col("m")).otherwise(F.lit(0))).alias(
            "oov_cnt"
        ),
    )
    return out.select(
        id_col,
        "token_cnt",
        "oov_cnt",
        F.when(
            F.col("token_cnt") > 0,
            F.round(F.col("oov_cnt").cast("double") / F.col("token_cnt"), 6),
        ).alias("oov_rate"),
    )


def kneser_ney_bigram(
    df: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantize: int | None = 6,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean bigram log-probability under INTERPOLATED
    Kneser-Ney smoothing (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.26)
    trained on the corpus's own counts — the proper-smoothing rung above
    the fixed-lambda interpolation of ``bigram_logprob`` and the exact
    2-gram seed of the KenLM scorer CCNet filters with:

        P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 ·)
                   + (D · N1+(w1 ·) / c(w1 ·)) · N1+(· w2) / B

    where c(w1 ·) is w1's left-continuation count, N1+(w1 ·) the distinct
    continuations of w1, N1+(· w2) the distinct left-contexts of w2, and
    B the corpus bigram-type count (the continuation distribution that
    makes KN famously robust to "San Francisco" artifacts). ``D=0.75`` is
    exact in binary so the arithmetic is engine-portable; token logprobs
    are 10^-quantize integer-snapped so the per-doc weighted mean is
    order-independent exact integer arithmetic.

    Shape at scale: identical to ``bigram_logprob`` — per-document bigram
    construction inside the scan, (doc, bigram) multiplicities, then four
    vocabulary-sized count frames (bigram counts, left-continuation,
    fan-out, fan-in) joined back on vocabulary keys plus one broadcast
    scalar (B). Every aggregation is map-side combinable; no corpus-wide
    hot key ever forms.

    ``train_df``: HELD-OUT scoring — the model counts (bc/c1/fanout/
    fanin/B) come from ``train_df`` while ``df``'s documents are
    scored, the fixed-scorer shape CCNet-style LM filtering deploys
    (self-trained scoring leaks the scored text into its own model).
    Held-out conventions: a bigram UNSEEN in training but whose w1 and
    w2 both occur in the training model scores through the pure
    continuation (backoff) term — exactly KN's smoothing mass,
    c(w1 w2) = 0 — while a bigram whose w1 has no training
    continuations or whose w2 has no training left-contexts cannot be
    assigned mass and is counted in the extra ``oov_bigrams`` column
    instead of the mean (added only in held-out mode, so the
    self-trained output schema is unchanged).
    """

    def doc_bigrams(frame: DataFrame) -> DataFrame:
        toks = _tokens(F.col(text_col))
        pairs = F.filter(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
            lambda x: x["w2"].isNotNull(),
        )
        bg = frame.select(
            F.col(id_col), F.explode(pairs).alias("_p")
        ).select(
            id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
        )
        return bg.groupBy(id_col, "w1", "w2").agg(
            F.count(F.lit(1)).alias("m")
        )

    # db feeds the scoring join AND (self-trained) the model counts; bc
    # feeds left/right/btypes AND the join — materialize both once, or
    # every consumer re-runs the corpus bigram explode + aggregation.
    # Both frames are the size the aggregation shuffle already moves
    # ((doc, bigram) multiplicities / distinct-bigram counts).
    db = doc_bigrams(df).transform(materialize)
    tb = db if train_df is None else doc_bigrams(train_df)
    bc = (
        tb.groupBy("w1", "w2")
        .agg(F.sum("m").alias("cb"))
        .transform(materialize)
    )
    left = bc.groupBy("w1").agg(
        F.sum("cb").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    right = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("fanin"))
    btypes = bc.agg(F.count(F.lit(1)).alias("btypes"))
    heldout = train_df is not None
    joined = (
        # held-out: unseen (w1, w2) pairs keep cb = 0 and score through
        # the backoff term; self-trained: every scored pair exists in bc
        (db.join(bc, ["w1", "w2"], "left") if heldout
         else db.join(bc, ["w1", "w2"]))
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(btypes))
    )
    cb0 = F.coalesce(F.col("cb"), F.lit(0)) if heldout else F.col("cb")
    d = F.lit(discount)
    prob = (
        F.greatest(cb0 - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("fanout") / F.col("c1"))
        * (F.col("fanin").cast("double") / F.col("btypes"))
    )
    lp = F.log(prob)
    if quantize is not None:
        scale = float(10 ** quantize)
        lpq = F.round(lp * scale).cast("long")
        mean = (F.sum(F.col("m") * lpq) / F.sum("m")) / F.lit(scale)
    else:
        mean = F.sum(F.col("m") * lp) / F.sum("m")
    scored = joined.groupBy(id_col).agg(
        mean.alias("kn_logprob"),
        F.sum("m").alias("bigram_cnt"),
    )
    if not heldout:
        return scored
    totals = db.groupBy(id_col).agg(F.sum("m").alias("_tot"))
    return (
        totals.join(scored, id_col, "left")
        .select(
            id_col,
            "kn_logprob",
            F.coalesce("bigram_cnt", F.lit(0))
            .cast("long")
            .alias("bigram_cnt"),
            (F.col("_tot") - F.coalesce(F.col("bigram_cnt"), F.lit(0)))
            .cast("long")
            .alias("oov_bigrams"),
        )
    )


def ngram_diversity(
    df: DataFrame,
    max_n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-n diversity (the corpus-level generation-diversity
    metric of Li et al. 2016 §4, applied as a data-quality report): per
    group and n-gram order, the number of n-gram positions, the number
    of DISTINCT n-grams, and their ratio (distinct-1 is the classic
    type-token ratio). Template-heavy or boilerplate-dominated sources
    show up as low ratios long before a human reads a sample.

    Returns ``(group, n, total_ngrams, distinct_ngrams, ttr)``.

    Shape at scale: n-grams for all orders are built per document
    inside the scan (the gopher_repetition shifted-slice construction)
    and leave through one explode into a (group, n, gram) count, then a
    (group, n) rollup — both map-side combinable; no join, and the
    hottest key holds one integer count.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")

    def grams(n: int):
        if n == 1:
            base = toks
        else:
            zipped = F.arrays_zip(
                *[
                    F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}")
                    for i in range(n)
                ]
            )
            base = F.transform(
                F.slice(
                    zipped, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))
                ),
                lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(n)]),
            )
        return F.transform(base, lambda g: F.concat(F.lit(f"{n}:"), g))

    all_grams = F.concat(*[grams(n) for n in range(1, max_n + 1)])
    ex = df.select(
        F.col(group_col), F.explode(all_grams).alias("_g")
    ).select(
        group_col,
        F.substring_index("_g", ":", 1).cast("int").alias("n"),
        F.col("_g").alias("_gram"),
    )
    per_gram = ex.groupBy(group_col, "n", "_gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return per_gram.groupBy(group_col, "n").agg(
        F.sum("_c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("_c"), 6
        ).alias("ttr"),
    )


def vocab_coverage(
    df: DataFrame,
    ks: tuple[int, ...] = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve — what fraction of all token POSITIONS
    the top-k most frequent words cover, for each candidate vocabulary
    size: the Zipf-curve measurement that sizes word vocabularies and
    predicts OOV rates before committing to a tokenizer (the corpus
    companion to ``oov_rate``, which scores documents against a FIXED
    vocabulary).

    Rank is (count desc, word asc) — deterministic at every boundary.
    Returns ``(k, covered, total, coverage)``.

    Shape at scale: one token explode into a word-count aggregate
    (map-side combinable, vocab-sized result ≪ corpus), then a
    distributed top-max(k) (TakeOrdered — no global sort, no
    single-partition window over the vocabulary) whose k-prefix sums
    are a tiny broadcast-side frame.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    counts = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("long").alias("total"))
    top = counts.orderBy(F.desc("c"), F.asc("w")).limit(max(ks))
    w = Window.orderBy(F.desc("c"), F.asc("w"))
    ranked = top.withColumn("r", F.row_number().over(w))
    spark = df.sparkSession
    kf = spark.createDataFrame([(int(k),) for k in sorted(ks)], "k int")
    return (
        ranked.crossJoin(F.broadcast(kf))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("r") <= F.col("k"), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("covered")
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "covered",
            "total",
            F.round(
                F.col("covered").cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )


_SCRIPTS = (
    # (name, Java-regex class) — order is the deterministic tiebreak
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[\\u0400-\\u04FF]"),
    ("greek", "[\\u0370-\\u03FF]"),
    ("arabic", "[\\u0600-\\u06FF]"),
    ("cjk", "[\\u4E00-\\u9FFF]"),
)


def script_mix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mixed_threshold_millis: int = 50,
) -> DataFrame:
    """Unicode-script composition per document — the mixed-script spam
    / wrong-corpus screen (homoglyph keyword stuffing shows up as a
    second script riding a dominant one long before language ID moves):
    per-script character counts (Latin, Cyrillic, Greek, Arabic, CJK),
    the dominant script (most chars; ties to the _SCRIPTS order), and a
    mixed flag when the runner-up script holds more than
    ``mixed_threshold_millis`` per-mille of scripted characters.

    Counts are regexp_count over explicit code-point classes (JVM-side,
    whole-stage codegen — a handful of regex scans per row, the
    documented exception to the translate() rule because these classes
    span thousands of code points); the flag arithmetic is exact
    integer per-mille. Map-only."""
    text = F.col(text_col)
    # cast to long at the source: regexp_count is int32 and the
    # per-mille products below would overflow it on multi-MB documents
    # (ANSI mode throws; legacy mode silently wraps)
    counts = {
        name: F.regexp_count(text, F.lit(cls))
        .cast("long")
        .alias(f"{name}_cnt")
        for name, cls in _SCRIPTS
    }
    base = df.select(F.col(id_col), *counts.values())
    total = None
    for name, _ in _SCRIPTS:
        c = F.col(f"{name}_cnt")
        total = c if total is None else total + c
    dom = F.lit(None).cast("string")
    best = F.greatest(*[F.col(f"{n}_cnt") for n, _ in _SCRIPTS])
    for name, _ in reversed(_SCRIPTS):
        dom = F.when(
            (F.col(f"{name}_cnt") == best) & (best > 0), F.lit(name)
        ).otherwise(dom)
    second = None
    for name, _ in _SCRIPTS:
        c = F.when(F.lit(name) != dom, F.col(f"{name}_cnt")).otherwise(
            F.lit(0)
        )
        second = c if second is None else F.greatest(second, c)
    return base.select(
        id_col,
        *[F.col(f"{n}_cnt").cast("long").alias(f"{n}_cnt") for n, _ in _SCRIPTS],
        total.cast("long").alias("scripted_cnt"),
        dom.alias("dominant_script"),
        F.when(
            (total > 0)
            & (second * 1000 > F.lit(int(mixed_threshold_millis)) * total),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("mixed_flag"),
    )


def langid_nb(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Trained language identification — hashed char-n-gram multinomial
    Naive Bayes with an explicit train/apply split (the fasttext-style
    lid.176 shape: character n-grams hashed into a fixed table, linear
    per-class scores, argmax). ``language_scores`` is the stopword
    HEURISTIC tier; this is the trained tier a CCNet-style curation
    stack actually gates on — char n-grams separate languages (and
    transliteration schemes) that share whitespace tokenization.

    Features are character ``n``-grams of ``lower(trim(text))`` hashed
    with the 32-bit md5 convention (``'lid:'`` salt keeps the table
    independent of the ``hashed_nb_classify`` token space); texts
    shorter than ``n`` chars contribute the whole text as one gram
    (``_shingle_array`` convention). Class-conditional weights are
    Laplace-smoothed log-probabilities quantized to 1e-6 micro-nats
    (BIGINT), scores are integer sums of weights plus the equally
    quantized class prior — bit-deterministic across engines — and ties
    break to the lexicographically smallest label. Test documents with
    zero grams (empty text) predict NULL.

    Returns ``(id, label, pred, correct)`` per TEST document (label is
    the test frame's ground-truth column, for accuracy audits).

    Shape at scale: gram explode is map-only inside each scan; ONE
    (doc, bucket) count shuffle per side (map-side combined, <=
    min(chars, n_buckets) rows/doc); the model is a (labels x
    n_buckets)-bounded frame, explicitly broadcast; scoring is one
    per-doc aggregate over labels x doc-buckets and a |labels|-row
    argmax window per doc. Nothing corpus-quadratic; train and test are
    each scanned once."""

    def _grams(df: DataFrame) -> DataFrame:
        s = F.lower(F.trim(F.col(text_col)))
        base = df.select(F.col(id_col), s.alias("_s"))
        full = F.expr(
            f"transform(sequence(1, length(_s) - {n - 1}),"
            f" i -> substring(_s, i, {n}))"
        )
        grams = F.when(F.length("_s") >= n, full).otherwise(
            F.array(F.col("_s"))
        )
        bucket = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("lid:"), F.col("_g")).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_buckets
        )
        return (
            base.select(F.col(id_col), F.explode(grams).alias("_g"))
            .filter(F.col("_g") != "")
            .select(F.col(id_col), bucket.alias("_b"))
            .groupBy(id_col, "_b")
            .agg(F.count(F.lit(1)).alias("_m"))
        )

    tr = _grams(train)
    lab = train.select(F.col(id_col), F.col(label_col).alias("_lab"))
    # the (label, bucket) count table is <= labels x n_buckets rows and
    # feeds tl, model AND (via tl) prior — materialize it once so the
    # train-side char-gram md5 pass does not re-run per consumer
    lb = (
        tr.join(lab, id_col)
        .groupBy("_lab", "_b")
        .agg(F.sum("_m").alias("_c"))
        .transform(materialize)
    )
    tl = lb.groupBy("_lab").agg(F.sum("_c").alias("_tl"))
    model = lb.join(tl, "_lab").select(
        "_lab",
        "_b",
        F.round(
            F.log(
                (F.col("_c") + 1).cast("double") / (F.col("_tl") + n_buckets)
            )
            * 1e6
        )
        .cast("long")
        .alias("_lq"),
    )
    labcnt = lab.groupBy("_lab").agg(F.count(F.lit(1)).alias("_nl"))
    total = labcnt.agg(F.sum("_nl").alias("_n"))
    prior = (
        labcnt.crossJoin(F.broadcast(total))
        .join(tl, "_lab")
        .select(
            "_lab",
            F.round(F.log(F.col("_nl").cast("double") / F.col("_n")) * 1e6)
            .cast("long")
            .alias("_pq"),
            F.round(F.log(F.lit(1.0) / (F.col("_tl") + n_buckets)) * 1e6)
            .cast("long")
            .alias("_missq"),
        )
    )
    te = _grams(test)
    scored = (
        te.crossJoin(F.broadcast(prior))
        .join(F.broadcast(model), ["_lab", "_b"], "left")
        .groupBy(id_col, "_lab")
        .agg(
            (
                F.first("_pq")
                + F.sum(
                    F.col("_m") * F.coalesce(F.col("_lq"), F.col("_missq"))
                )
            ).alias("_score")
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("_lab"))
    pred = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col("_lab").alias("pred"))
    )
    return (
        test.select(F.col(id_col), F.col(label_col).alias("label"))
        .join(pred, id_col, "left")
        .select(
            F.col(id_col),
            "label",
            "pred",
            F.when(F.col("pred") == F.col("label"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("correct"),
        )
    )
