"""Corpus cleaning operators: HTML-to-text extraction, C4 line/page
heuristics, and CCNet-style corpus-wide line deduplication (one-shot,
incremental-index, and streaming forms).

The most-reproduced web-corpus cleaning stages, as published:

* ``c4_line_filter`` — the C4 heuristics (Raffel et al. 2020, "Exploring
  the Limits of Transfer Learning with a Unified Text-to-Text
  Transformer", §2.2): keep only lines that end in terminal punctuation,
  contain at least five words, and don't mention javascript; drop whole
  pages with fewer than three surviving lines, a "lorem ipsum" marker, or
  a curly brace (code leak-through).
* ``line_dedup`` — CCNet-style line-level deduplication (Wenzek et al.
  2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  Crawl Data", §3): every line is hashed corpus-wide and only its first
  occurrence survives, which strips boilerplate (nav bars, cookie
  banners, copyright footers) that per-document dedup can't see.

Scale shapes:

* ``c4_line_filter`` is map-only — all rules are per-document array
  expressions inside whole-stage codegen; no shuffle, no state.
* ``line_dedup`` is the one operator here that must see the corpus: one
  explode → a single shuffle partitioned by the line hash (first-
  occurrence rank is per-key, so skew is bounded by the most-duplicated
  boilerplate line; the hash key spreads uniformly otherwise) → one
  doc-keyed aggregation to reassemble. No corpus-wide window, no
  driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4's terminal-punctuation set: a line must end in one of these to be a
# "sentence" (the paper's heuristic for prose vs. menu/boilerplate lines)
TERMINAL_PUNCT = (".", "!", "?", '"')

MIN_WORDS_PER_LINE = 5
MIN_LINES_PER_PAGE = 3


def _line_kept(line: Column) -> Column:
    """C4 line-level keep rule: terminal punctuation, >= 5 words, and no
    javascript mention (case already normalized by the caller's split)."""
    last = F.substring(line, -1, 1)
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    return (
        last.isin(*TERMINAL_PUNCT)
        & (words >= MIN_WORDS_PER_LINE)
        & ~F.lower(line).contains("javascript")
    )


def c4_line_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Apply the C4 cleaning heuristics to newline-delimited documents.

    Returns one row per input document with:

    * ``n_lines`` — lines in the raw page,
    * ``kept_lines`` — lines surviving the line rules,
    * ``page_kept`` — false when the page as a whole is discarded
      (< 3 surviving lines, contains "lorem ipsum", or contains ``{``),
    * ``clean_text`` — surviving lines rejoined with ``\\n``; NULL when
      the page is dropped.

    Map-only: every rule is a per-row array expression (split → filter →
    array_join), so the operator runs inside whole-stage codegen with no
    shuffle — at 100 TB it is a pure scan-side projection that weak-scales
    with executors.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(lines, _line_kept)
    page_kept = (
        (F.size(kept) >= MIN_LINES_PER_PAGE)
        & ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
    )
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("kept_lines"),
        page_kept.alias("page_kept"),
        F.when(page_kept, F.array_join(kept, "\n")).alias("clean_text"),
    )


def line_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide line deduplication: only the first occurrence of every
    line survives, ordered by (id, position) — CCNet's boilerplate
    remover re-expressed as one hash-partitioned shuffle.

    Returns one row per input document with ``n_lines``,
    ``removed_lines``, and ``clean_text`` (surviving lines rejoined in
    original order; empty string when every line was a later duplicate).

    Shape at scale: posexplode → per-line-hash min((id, pos)) aggregate
    (map-side combinable: one candidate row per hash per map task crosses
    the shuffle) → join back to mark keepers → doc-keyed reassembly with
    map-side-combinable aggregates. A row_number window on the line hash
    would pin every occurrence of a viral boilerplate line ("Thank you
    for reading", cookie banners — 10^8+ repeats at corpus scale) to ONE
    task; the aggregate+join shape gets partial aggregation and AQE skew
    splitting instead (guide §2.5 — windows get neither).
    """
    ex = _line_occurrences(df, id_col, text_col)
    firsts = ex.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_f")
    )
    flagged = ex.join(firsts, "_h").withColumn(
        "_keep",
        (F.col(id_col) == F.col(f"_f.{id_col}"))
        & (F.col("_pos") == F.col("_f._pos")),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((~F.col("_keep")).cast("long")).alias("removed_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )


def _line_occurrences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, _pos, _line, _h) — every line of every document with its
    position and md5 hash."""
    lines = F.split(F.col(text_col), "\n")
    return df.select(
        F.col(id_col), F.posexplode(lines).alias("_pos", "_line")
    ).withColumn("_h", F.md5(F.col("_line").cast("binary")))


def write_line_index(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist the corpus line-dedup state for append-only maintenance —
    the third persisted dedup index next to the MinHash band and SimHash
    block registries.

    Layout: ``{path}/lines`` holds one row per DISTINCT line hash with
    its canonical first occurrence ``(line_hash, doc_id, pos)``.
    ``append_line_dedup`` then explodes ONLY new batches: an append to a
    100 TB-indexed corpus costs the batch's lines plus one hash-keyed
    join against the index — never a corpus rescan. Appends are plain
    parquet appends; production writes go through a transactional commit
    (sources.store's manifest-snapshot pattern).
    """
    ex = _line_occurrences(df, id_col, text_col)
    # min((id, pos)) per line hash — one map-side-combinable aggregate,
    # no window and no join at all (only the canonical rows are needed)
    (
        ex.groupBy("_h")
        .agg(F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_f"))
        .select(
            F.col("_h").alias("line_hash"),
            F.col(f"_f.{id_col}").alias(id_col),
            F.col("_f._pos").alias("pos"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/lines")
    )


def append_line_dedup(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deduplicate a NEW batch of documents against a ``write_line_index``
    index, register the batch's novel lines, and return the batch's
    cleaned rows (same schema as ``line_dedup``: id, n_lines,
    removed_lines, clean_text).

    A batch line already in the index is removed; a line new to the index
    survives at its first (id, pos) occurrence WITHIN the batch and later
    batch repeats are removed — so appending batches in id order and
    concatenating the outputs equals one ``line_dedup`` run over the
    union (the stream ≡ batch property the other index appenders hold).

    Replay-idempotent: the index stores each line's canonical (id, pos),
    and an indexed line whose canonical occurrence IS this batch row
    stays kept — re-running a crashed micro-batch reproduces the same
    cleaned rows and inserts nothing (the insert is anti-joined against
    the index), the streaming-sink requirement.

    Shape at scale: the batch explode + a per-hash min((id, pos))
    aggregate over the batch (map-side combinable) joined with the index
    into ONE one-row-per-hash meta frame, then a single hash-keyed join
    back to the batch rows (AQE-skew-splittable — a row_number window on
    the line hash would pin a viral line's occurrences to one task).
    The batch's novel first occurrences are localCheckpoint-pinned
    before the index append so the returned frame never re-reads its own
    write.
    """
    spark = new_docs.sparkSession
    ex = _line_occurrences(new_docs, id_col, text_col)
    idx = spark.read.parquet(f"{path}/lines").select(
        F.col("line_hash").alias("_h"),
        F.col(id_col).alias("_idx_id"),
        F.col("pos").alias("_idx_pos"),
    )
    # one row per batch-distinct hash: the batch's first (id, pos) plus
    # the index's canonical occurrence when the line is already indexed
    meta = (
        ex.groupBy("_h")
        .agg(F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_f"))
        .join(idx, "_h", "left")
    )
    flagged = (
        ex.join(meta, "_h")
        .withColumn(
            "_keep",
            F.when(
                F.col("_idx_id").isNull(),
                (F.col(id_col) == F.col(f"_f.{id_col}"))
                & (F.col("_pos") == F.col("_f._pos")),
            ).otherwise(
                (F.col("_idx_id") == F.col(id_col))
                & (F.col("_idx_pos") == F.col("_pos"))
            ),
        )
        .drop("_f")
        # BATCH-sized (one row per line of the appended batch), and the
        # appends below rewrite the index files this plan reads —
        # lineage must be severed, so localCheckpoint, not materialize()
        .localCheckpoint(eager=True)
    )
    novel = flagged.filter(
        F.col("_keep") & F.col("_idx_id").isNull()
    ).select(
        F.col("_h").alias("line_hash"),
        F.col(id_col),
        F.col("_pos").alias("pos"),
    )
    novel.write.mode("append").parquet(f"{path}/lines")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum((~F.col("_keep")).cast("long")).alias("removed_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )


# HTML entities decoded by extract_html_text — the named set that
# dominates real web text plus the numeric apostrophe
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # LAST: &amp;lt; must become &lt;, not <
]

# closing tags that imply a paragraph/line break in the extracted text
_BLOCK_BREAK_RE = (
    r"(?i)<br\s*/?>|</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)\s*>"
)


def extract_html_text(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Boilerplate HTML → newline-structured plain text — the first stage
    of every web-corpus pipeline (the jusText/trafilatura niche, reduced
    to its deterministic regex core so it runs inside whole-stage codegen
    and reproduces bit-exactly in any RE2/Java-regex engine):

    1. drop ``<script>``/``<style>``/``<!-- -->`` blocks wholesale,
    2. turn block-closing tags (``</p>``, ``</div>``, ``<br>``, ...) into
       newlines,
    3. strip every remaining tag,
    4. decode the dominant named entities (``&amp;`` last, so double-
       escaped text un-escapes one level like real parsers),
    5. normalize whitespace: runs of spaces/tabs collapse to one space,
       lines are trimmed, empty lines dropped.

    Returns ``(id, text, n_lines)`` — feed it straight into
    ``c4_line_filter`` / ``line_dedup``.

    Map-only: a fixed chain of regexp_replace/translate projections; no
    shuffle, no UDF — at 100 TB this is scan-bound and weak-scales with
    executors.
    """
    x = F.col(html_col)
    # (?is): case-insensitive + dotall, valid in both Java regex and RE2;
    # lazy body so adjacent blocks don't merge
    x = F.regexp_replace(x, r"(?is)<script\b[^>]*>.*?</script\s*>", "")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", "")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", "")
    x = F.regexp_replace(x, _BLOCK_BREAK_RE, "\n")
    x = F.regexp_replace(x, r"<[^>]*>", "")
    for ent, rep in _HTML_ENTITIES:
        x = F.regexp_replace(x, ent, rep)
    x = F.regexp_replace(x, r"[ \t]+", " ")
    lines = F.filter(
        F.transform(F.split(x, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    return df.select(
        F.col(id_col),
        F.array_join(lines, "\n").alias("text"),
        F.size(lines).alias("n_lines"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode NFC composition + whitespace canonicalization — the
    normalization pass every tokenizer-prep pipeline runs first (GPT-2 /
    SentencePiece corpora are NFC- or NFKC-normalized before BPE so that
    'e'+U+0301 and U+00E9 share one vocabulary entry).

    NFC runs in an Arrow-batched pandas UDF (the JVM has no NFC
    builtin; UAX #15 composition is identical between Python's
    unicodedata and DuckDB's nfc_normalize, which the oracle uses).
    Whitespace collapse and trim stay JVM-side. Returns
    (id, norm_text, n_chars_raw, n_chars_norm, changed).

    Shape at scale: a single per-row map inside the scan — no shuffle;
    the UDF cost is one Arrow round-trip over the text column only
    (column pruning keeps the batch narrow).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # note: no type hints — clean.py has `from __future__ import
    # annotations`, which stringifies them past pandas_udf's inspection
    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: None
            if x is None
            else unicodedata.normalize("NFC", x)
        )

    raw = F.col(text_col)
    norm = F.trim(F.regexp_replace(_nfc(raw), r"\s+", " "))
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.length(raw).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.when(norm != raw, F.lit(1)).otherwise(F.lit(0)).alias("changed"),
    )
