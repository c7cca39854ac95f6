"""Corpus-cleaning operators — the scrub/filter stages a training-data
pipeline runs between extraction and dedup (CCNet/RefinedWeb/Gopher-style
rules, public recipes). All pure JVM expressions: no Python in any plan,
every op exactly cross-checkable in DuckDB.

- pii_scrub:        mask emails / IPv4s, report match counts.
- paragraph_dedup:  corpus-LEVEL paragraph dedup (CCNet's line-level
                    dedup shape): one row per non-empty paragraph with
                    its keep/drop verdict — first occurrence wins,
                    ordered by (doc_id, para_idx).
- repetition_stats: Gopher-style repetition signals per doc (duplicate
                    line / paragraph fractions) for quality filtering.

Regex discipline: patterns restricted to syntax with identical semantics
in Java regex (Spark) and RE2 (DuckDB) — char classes, bounded repeats,
\\b word boundaries; no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_ocr_spark.ops.text_stats import STOPWORDS, WS_RE  # noqa: F401
# WS_RE is canonically defined in text_stats (re-exported here for the
# existing cleaning/curate import surface)

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: deliberately permissive (ADVICE r2): accepts out-of-range octets
#: (999.999.999.999) and matches the first four octets of longer dotted
#: runs like version strings (1.2.3.4.5 -> masks "1.2.3.4"). The
#: over-match is the CC-Net-style recall-first trade; the per-octet
#: range alternation (25[0-5]|2[0-4][0-9]|1?[0-9]{1,2}) is NOT used
#: because leftmost-first (Java) vs leftmost-longest (RE2) alternation
#: semantics could silently diverge between Spark and the DuckDB oracle.
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_expr(col: F.Column) -> F.Column:
    """The canonical PII mask chain (emails first, then IPv4s) — single
    source for pii_scrub, curate_corpus, and their oracles."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """-> (doc_id, clean_text, n_emails, n_ips).

    Emails mask first, then IPv4s (order matters: an IP inside an
    already-masked email must not double count). Counts come from the
    pre-mask text for emails and the email-masked text for IPs —
    exactly the sequential rewrite DuckDB's oracle applies.
    """
    emails_masked = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        scrub_expr(F.col("text")).alias("clean_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(emails_masked, F.lit(IPV4_RE), F.lit(0)))
        .alias("n_ips"),
    )


def _paragraphs(docs: DataFrame) -> DataFrame:
    """One row per non-empty trimmed paragraph: (doc_id, para_idx, phash).
    para_idx counts non-empty paragraphs in document order."""
    split = F.split(F.col("text"), r"\n")
    paras = docs.select(
        "doc_id", F.posexplode(split).alias("raw_idx", "para")
    ).withColumn("para", F.trim("para")).filter(F.length("para") > 0)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("raw_idx")
    return paras.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("para_idx"),
        F.md5(F.col("para").cast("binary")).alias("phash"),
    )


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-level paragraph dedup verdicts.

    -> (doc_id, para_idx, phash, keep_doc, keep_idx, is_dup): the keeper
    of a paragraph hash is its first occurrence in (doc_id, para_idx)
    order. Two grouped passes (min doc, then min idx within that doc) —
    both engines agree without struct-ordering semantics. At scale this
    is two hash aggregations plus a broadcast-able join on the (far
    smaller) distinct-hash side.
    """
    paras = _paragraphs(docs)
    kd = paras.groupBy("phash").agg(F.min("doc_id").alias("keep_doc"))
    ki = (
        paras.join(kd, "phash")
        .where(F.col("doc_id") == F.col("keep_doc"))
        .groupBy("phash", "keep_doc")
        .agg(F.min("para_idx").alias("keep_idx"))
    )
    return paras.join(ki, "phash").select(
        "doc_id",
        "para_idx",
        "phash",
        "keep_doc",
        "keep_idx",
        (
            (F.col("doc_id") != F.col("keep_doc"))
            | (F.col("para_idx") != F.col("keep_idx"))
        )
        .cast("int")
        .alias("is_dup"),
    )


#: Gopher-rule thresholds (Rae et al. 2021, §A1.1 shapes, calibrated to
#: this corpus' distributions so both verdicts actually occur at test SF)
GOPHER_MIN_TOKENS = 30
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_TOK_LEN = 3.0
GOPHER_MAX_MEAN_TOK_LEN = 10.0
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
#: THE stop list — imported, not re-declared, so it cannot drift from
#: quality_score's counting (their signal agreement is pytest-pinned)
GOPHER_STOPWORDS = STOPWORDS


def dup_frac_stats(col: F.Column) -> tuple[F.Column, F.Column, F.Column]:
    """(n, n_distinct, dup_fraction) over a split-array column: trimmed,
    empties dropped, fraction round(6), 0.0 when empty. SINGLE source of
    the Gopher repetition expression — repetition_stats' signal columns
    and gopher_filter's rule inputs are pinned equal by test."""
    trimmed = F.filter(
        F.transform(col, lambda x: F.trim(x)), lambda x: F.length(x) > 0
    )
    n = F.size(trimmed)
    nd = F.size(F.array_distinct(trimmed))
    frac = F.when(n > 0, F.round(1.0 - nd / n, 6)).otherwise(F.lit(0.0))
    return n, nd, frac


def _gopher_signals() -> tuple[F.Column, ...]:
    """The Gopher rule columns over a ``text`` column — all pure
    whole-stage-codegen row expressions, shared by ``gopher_filter``
    (the audit-table op) and ``gopher_keep_expr`` (the inline gate).
    Returns (n_tok, mean_tok_len, n_stop, dup_line, dup_para,
    fail_tokens, fail_tok_len, fail_stop, fail_dup_line,
    fail_dup_para)."""
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.trim(text), WS_RE)
    n_tok = F.size(toks)
    n_tok_d = n_tok.cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS)))
    n_chars = F.length(F.regexp_replace(F.trim(text), WS_RE, ""))
    mean_tok_len = n_chars / n_tok_d

    _, _, dup_line = dup_frac_stats(F.split(text, r"\n"))
    _, _, dup_para = dup_frac_stats(F.split(text, r"\n[ \t]*\n+"))

    fail_tokens = (
        (n_tok < GOPHER_MIN_TOKENS) | (n_tok > GOPHER_MAX_TOKENS)
    ).cast("int")
    fail_tok_len = (
        (mean_tok_len < GOPHER_MIN_MEAN_TOK_LEN)
        | (mean_tok_len > GOPHER_MAX_MEAN_TOK_LEN)
    ).cast("int")
    fail_stop = (n_stop < GOPHER_MIN_STOP_HITS).cast("int")
    fail_dup_line = (dup_line > GOPHER_MAX_DUP_LINE_FRAC).cast("int")
    fail_dup_para = (dup_para > GOPHER_MAX_DUP_PARA_FRAC).cast("int")
    return (
        n_tok,
        mean_tok_len,
        n_stop,
        dup_line,
        dup_para,
        fail_tokens,
        fail_tok_len,
        fail_stop,
        fail_dup_line,
        fail_dup_para,
    )


def gopher_keep_expr() -> F.Column:
    """The Gopher keep verdict as ONE boolean row expression over a
    ``text`` column — lets a pipeline apply the gate as a FILTER on the
    same row instead of joining ``gopher_filter`` verdicts back (a join
    arm re-plans the whole upstream subtree; see
    curate.pretrain_pipeline's plan notes). Pinned equal to
    gopher_filter.keep by pytest."""
    (_, _, _, _, _, f1, f2, f3, f4, f5) = _gopher_signals()
    return (f1 + f2 + f3 + f4 + f5) == 0


def gopher_filter(docs: DataFrame) -> DataFrame:
    """Gopher-style quality-gate VERDICTS per document — the keep/drop
    decision the repetition/quality signals exist for (the cleaning
    twin of dedup's resolve step).

    -> (doc_id, n_tokens, mean_tok_len, n_stop_hits, dup_line_frac,
        dup_para_frac, fail_tokens, fail_tok_len, fail_stop,
        fail_dup_line, fail_dup_para, keep)

    ONE pass, pure whole-stage-codegen expressions (same WS_RE / trim /
    non-empty discipline as repetition_stats and quality_score so the
    DuckDB oracle agrees byte-for-byte); per-rule fail flags make the
    verdict auditable. keep = 1 iff no rule fails — including for NULL
    text (ADVICE r3): NULL propagates through every comparison, so an
    un-coalesced NULL doc would get NULL flags and NULL keep, and a
    consumer quarantining keep == 0 would silently pass it. NULL text
    coalesces to '' up front (1 empty token, 0 chars): fail_tokens and
    fail_stop fire, keep = 0, every signal column is defined. The
    oracle applies the same coalesce.
    """
    (
        n_tok,
        mean_tok_len,
        n_stop,
        dup_line,
        dup_para,
        fail_tokens,
        fail_tok_len,
        fail_stop,
        fail_dup_line,
        fail_dup_para,
    ) = _gopher_signals()
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        n_stop.alias("n_stop_hits"),
        dup_line.alias("dup_line_frac"),
        dup_para.alias("dup_para_frac"),
        fail_tokens.alias("fail_tokens"),
        fail_tok_len.alias("fail_tok_len"),
        fail_stop.alias("fail_stop"),
        fail_dup_line.alias("fail_dup_line"),
        fail_dup_para.alias("fail_dup_para"),
        (
            (fail_tokens + fail_tok_len + fail_stop + fail_dup_line
             + fail_dup_para) == 0
        )
        .cast("int")
        .alias("keep"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document.

    -> (doc_id, n_lines, n_distinct_lines, dup_line_frac, n_paras,
        n_distinct_paras, dup_para_frac). Lines split on \\n; paragraphs
    split on blank-line runs; both trimmed, empties dropped; fractions
    round(6), 0.0 for empty docs. Pure higher-order-function
    expressions — stays inside whole-stage codegen.
    """

    lines = F.split(F.col("text"), r"\n")
    paras = F.split(F.col("text"), r"\n[ \t]*\n+")
    nl, ndl, fl = dup_frac_stats(lines)
    np_, ndp, fp = dup_frac_stats(paras)
    return docs.select(
        "doc_id",
        nl.alias("n_lines"),
        ndl.alias("n_distinct_lines"),
        fl.alias("dup_line_frac"),
        np_.alias("n_paras"),
        ndp.alias("n_distinct_paras"),
        fp.alias("dup_para_frac"),
    )


#: C4 line-keep thresholds (Raffel et al. 2020 §2.2, the public recipe)
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
#: terminal punctuation closing a kept line (period, exclamation,
#: question mark, end quotation mark)
C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(docs: DataFrame) -> DataFrame:
    """-> (doc_id, clean_text, n_lines_kept, n_lines_total, keep_doc):
    the C4 line-level cleaning pass (Raffel et al. 2020), the third
    public cleaning recipe next to CCNet (paragraph_dedup) and Gopher
    (gopher_filter):

    line rules (a line survives iff ALL hold):
      1. its trimmed text ends in terminal punctuation (. ! ? ");
      2. it has >= C4_MIN_LINE_WORDS whitespace words;
      3. it does not contain the word "javascript" (case-insensitive).
    doc rules (keep_doc = 1 iff ALL hold):
      4. >= C4_MIN_KEPT_LINES lines survive (the paper's "fewer than 3
         sentences" gate, applied to kept lines);
      5. the doc contains neither "lorem ipsum" (lowercased) nor "{".

    clean_text = surviving lines re-joined with newlines (all docs get
    one, so quarantined docs stay inspectable); NULL text -> empty doc
    with keep_doc = 0, mirroring gopher_filter's NULL contract. Pure
    JVM: one split + higher-order filter + array_join per row, no
    shuffle at all — like sample_stratified this is a zero-exchange
    map-only plan that composes with downstream ops. Terminal-punct and
    containment checks use substring/locate primitives; the only regex
    beyond the line split is an explicit-character-class edge trim
    (DuckDB mirrors it with two-argument trim()) — no alternation over
    engine-divergent token classes anywhere.
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    # \r?\n, not \n: Spark's trim() strips only spaces, so splitting a
    # CRLF (Windows) document on bare \n would leave a trailing \r on
    # every line — failing the terminal-punctuation rule for ALL lines
    # of a perfectly clean doc (and the oracle would agree, so only a
    # CRLF pytest catches it)
    lines = F.split(text, r"\r?\n")
    # trim the FULL whitespace class, not F.trim (spaces only): a
    # trailing tab would otherwise defeat the terminal-punct rule for a
    # clean line, and a leading tab would add a phantom '' word — the
    # same class of bug the \r?\n split above fixes for CRLF. Word
    # count filters empties (the lm_tokens idiom) so edge whitespace
    # can never inflate it.
    t = lambda ln: F.regexp_replace(  # noqa: E731
        ln, r"^[ \t\n\f\r]+|[ \t\n\f\r]+$", ""
    )
    n_words = lambda ln: F.size(  # noqa: E731
        F.filter(F.split(t(ln), WS_RE), lambda w: F.length(w) > 0)
    )
    keep_line = lambda ln: (  # noqa: E731
        F.substring(t(ln), -1, 1).isin(*C4_TERMINALS)
        & (n_words(ln) >= C4_MIN_LINE_WORDS)
        & ~F.lower(ln).contains("javascript")
    )
    kept = F.filter(lines, keep_line)
    n_kept = F.size(kept)
    bad_doc = F.lower(text).contains("lorem ipsum") | text.contains("{")
    return docs.select(
        "doc_id",
        F.array_join(kept, "\n").alias("clean_text"),
        n_kept.alias("n_lines_kept"),
        F.size(lines).alias("n_lines_total"),
        F.when(
            (n_kept >= C4_MIN_KEPT_LINES) & ~bad_doc, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("keep_doc"),
    )
