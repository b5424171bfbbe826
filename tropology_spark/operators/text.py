"""Text-analysis operators (SURVEY.md §2 J4-J7) — north-star additions.

Token statistics over ``documents``: wordcount, TF-IDF, bigrams, and
per-language/source profiles.  The reference analog is tropology's
trope-snippet text extraction (``api.clj`` — reconstructed); the
LLM-pipeline framing adds corpus-level statistics.

All four stay JVM-side: split/explode/groupBy/window — no Python in
the hot path.  At 100 TB the explode output is the dominant
intermediate; partial aggregation (map-side combine) keeps the shuffle
proportional to distinct (doc, token) pairs, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tropology_spark.registry import register
from tropology_spark.session import iter_materialize
from tropology_spark.sources.tables import load


@register(
    "text_wordcount",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — corpus word count (tokenize → explode → count)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_tfidf_top",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS score
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tf, score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, token) AS rn
          FROM scored) t
    WHERE rn = 1
    """,
)
def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — top TF-IDF term per document.  The rank runs on the
    6-dp-rounded score (identical in both engines) with the token as
    tie-break, so term selection is fully deterministic."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "token", "tf", "score")
    )


@register(
    "text_bigrams",
    oracle="""
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT l[i] || ' ' || l[i + 1] AS bigram
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    )
    GROUP BY bigram
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — bigram counts via adjacent-array zip (no shuffle until the
    final count; the oracle enumerates positions relationally)."""
    d = load(spark, sf_dir, "documents")
    # Materialize the token array once (three references below would
    # otherwise re-split the text three times per row).
    toked = d.select(F.split(F.col("text"), " ").alias("t"))
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        toked.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — language/source profile; integer sums → the average is an
    exact division, deterministic across engines."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# North-star text-analysis extensions: language ID, quality scoring,
# token counting, document fingerprinting (BASELINE.json north star).
# --------------------------------------------------------------------------

_STOPWORDS = ("a", "the", "data", "key")


@register(
    "text_langid_nb",
    oracle="""
    WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf_doc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, token),
    prof AS (SELECT lang AS p_lang, token AS p_token, CAST(count(*) AS BIGINT) AS cnt
             FROM tok GROUP BY lang, token),
    tot AS (SELECT lang AS t_lang, CAST(count(*) AS BIGINT) AS total FROM tok GROUP BY lang),
    vocab AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM tok),
    langs AS (SELECT DISTINCT lang AS cand_lang FROM documents),
    scores AS (
      SELECT t.doc_id, l.cand_lang,
             round(sum(t.tf * ln((coalesce(p.cnt, 0) + 1.0) / (tot.total + vocab.v))), 6)
               AS score
      FROM tf_doc t
      CROSS JOIN langs l
      LEFT JOIN prof p ON p.p_lang = l.cand_lang AND p.p_token = t.token
      JOIN tot ON tot.t_lang = l.cand_lang
      CROSS JOIN vocab
      GROUP BY t.doc_id, l.cand_lang, tot.total, vocab.v
    )
    SELECT s.doc_id, d.lang AS true_lang, s.cand_lang AS pred_lang, s.score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, cand_lang) AS rn
          FROM scores) s
    JOIN documents d ON s.doc_id = d.doc_id
    WHERE rn = 1
    """,
)
def text_langid_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via a corpus-trained naive-Bayes n-gram (unigram)
    model: per-language token frequencies with add-one smoothing,
    argmax of the summed log-likelihood.  The heuristic the north star
    asks for, self-trained so it is fully SQL-expressible; ranking runs
    on the 6-dp-rounded score with the language as tie-break."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf_doc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    prof = tok.groupBy(
        F.col("lang").alias("p_lang"), F.col("token").alias("p_token")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = tok.groupBy(F.col("lang").alias("t_lang")).agg(F.count(F.lit(1)).alias("total"))
    vocab = tok.agg(F.countDistinct("token").alias("v"))
    langs = d.select(F.col("lang").alias("cand_lang")).distinct()
    scores = (
        tf_doc.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(prof),
            (F.col("p_lang") == F.col("cand_lang")) & (F.col("p_token") == F.col("token")),
            "left",
        )
        .join(F.broadcast(tot), F.col("t_lang") == F.col("cand_lang"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "cand_lang")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / (F.col("total") + F.col("v")))
                ),
                6,
            ).alias("score")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand_lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .select("doc_id", "true_lang", F.col("cand_lang").alias("pred_lang"), "score")
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    st AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(length(token)) AS BIGINT) AS sum_len,
             CAST(sum(CASE WHEN token IN {_STOPWORDS!r} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stop
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           round(CAST(n_stop AS DOUBLE) / n_tokens * 0.5
                 + CAST(least(n_tokens, 100) AS DOUBLE) / 200.0, 6) AS quality
    FROM st
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from cheap surface statistics (length, stopword
    ratio) — the north-star heuristic filter shape.  All components are
    exact integer ratios → deterministic."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    st = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("token")).cast("bigint").alias("sum_len"),
        F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0))
        .cast("bigint")
        .alias("n_stop"),
    )
    n_t = F.col("n_tokens")
    return st.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("sum_len").cast("double") / n_t, 6).alias("avg_token_len"),
        F.round(F.col("n_stop").cast("double") / n_t, 6).alias("stop_ratio"),
        F.round(
            F.col("n_stop").cast("double") / n_t * 0.5
            + F.least(n_t, F.lit(100)).cast("double") / 200.0,
            6,
        ).alias("quality"),
    )


@register(
    "text_token_stats",
    oracle="""
    WITH tok AS (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS token
                 FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS ws_tokens,
           CAST(sum(CAST(ceil(length(token) / 4.0) AS BIGINT)) AS BIGINT) AS bpe_est,
           round(CAST(any_value(n_chars) AS DOUBLE) / count(*), 6) AS chars_per_token
    FROM tok GROUP BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword
    estimate (ceil(len/4) per word — the ~4-chars-per-token rule used
    for budget estimation in LLM pipelines)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "n_chars", F.explode(F.split(F.col("text"), " ")).alias("token"))
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("ws_tokens"),
        F.sum(F.ceil(F.length("token") / 4.0)).cast("bigint").alias("bpe_est"),
        F.round(F.any_value(F.col("n_chars")).cast("double") / F.count(F.lit(1)), 6).alias(
            "chars_per_token"
        ),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH sh AS (
      SELECT doc_id, l[i] || ' ' || l[i + 1] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    )
    SELECT doc_id,
           min(md5(shingle)) AS fingerprint,
           CAST(count(DISTINCT shingle) AS BIGINT) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: min-hash over rolling word-bigram
    shingles (winnowing's 'min of window hashes' idea with md5 as the
    portable hash).  Equal fingerprints → near-identical leading
    content; the fingerprint doubles as a cheap cluster key."""
    d = load(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    shingles = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    sh = toked.select("doc_id", F.explode(shingles).alias("shingle"))
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_shingles"),
    )


@register(
    "text_snippets",
    oracle="""
    SELECT doc_id,
           CAST(instr(text, 'data') AS BIGINT) AS hit_pos,
           substring(text, greatest(CAST(instr(text, 'data') AS BIGINT) - 20, 1), 60)
             AS snippet
    FROM documents
    WHERE instr(text, 'data') > 0
    """,
)
def text_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippet extraction — the reference's
    trope-snippet view (``tropes-from-node``: the text fragment around
    each trope link).  Pure string arithmetic: first-hit position and
    a fixed window around it, identical in both engines."""
    d = load(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), "data").cast("bigint")
    return (
        d.filter(pos > 0)
        .select(
            "doc_id",
            pos.alias("hit_pos"),
            F.expr(
                "substring(text, greatest(CAST(instr(text, 'data') AS BIGINT) - 20, 1L), 60)"
            ).alias("snippet"),
        )
    )


# ---------------------------------------------------------------------------
# M64 — PII-style redaction (regex scrubbing with audit counts)
# ---------------------------------------------------------------------------

#: Digit runs (ids, account numbers) — the one PII-ish pattern the
#: synthetic fixtures actually contain (events.props carries JSON
#: integers).  The pattern is deliberately dialect-neutral: both Java
#: regex (Spark) and RE2 (DuckDB) read `[0-9]+` identically.
_REDACT_PATTERN = "[0-9]+"
_REDACT_TOKEN = "<NUM>"


@register(
    "text_pii_redact",
    oracle=f"""
    SELECT event_id,
           regexp_replace(event_type || ' ' || props,
                          '{_REDACT_PATTERN}', '{_REDACT_TOKEN}', 'g') AS redacted,
           CAST(len(regexp_extract_all(event_type || ' ' || props,
                                       '{_REDACT_PATTERN}')) AS BIGINT) AS n_redacted
    FROM events
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M64 — PII-style scrubbing: replace every digit run in the event
    log line (type + raw JSON props) with a redaction token and report
    the per-row redaction count — the audit column a compliance
    pipeline ships alongside the scrubbed text.  Real PII patterns
    (emails, phone numbers) are the same plan with a longer regex
    alternation; the fixtures only contain numeric ids, so the declared
    pattern is the digit run.

    Both the rewrite and the count are single JVM-side regex passes
    (no Python); DuckDB needs the explicit 'g' flag where Spark's
    regexp_replace is global by default.  Scale: embarrassingly
    parallel — a narrow map with no shuffle at all."""
    ev = load(spark, sf_dir, "events")
    line = F.concat_ws(" ", F.col("event_type"), F.col("props"))
    return ev.select(
        "event_id",
        F.regexp_replace(line, _REDACT_PATTERN, _REDACT_TOKEN).alias("redacted"),
        F.regexp_count(line, F.lit(_REDACT_PATTERN)).cast("bigint").alias("n_redacted"),
    )


# ---------------------------------------------------------------------------
# M67 — rare-token rate (corpus-frequency quality signal)
# ---------------------------------------------------------------------------

_RARE_MAX_DF = 50  # a token is "rare" if its corpus document frequency < this


@register(
    "text_rare_token_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN d.doc_freq < {_RARE_MAX_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rare
    FROM tok t JOIN df d USING (token)
    GROUP BY t.doc_id
    """,
)
def text_rare_token_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M67 — per-document rare-token exposure: how many of a document's
    tokens have corpus document-frequency below {n}.  The integer core
    of a perplexity-style quality gate — a document dominated by tokens
    the corpus has rarely seen is OCR noise, boilerplate mangling, or
    another language; the full -Σ log p score is float-order-dependent,
    but its actionable signal (rare-token count vs total) is exact.

    Scale: the document-frequency table is vocabulary-sized — broadcast
    onto the token stream, so the big side never shuffles for the
    enrichment join (the M45 vocab/OOV shape); the per-doc aggregate
    combines map-side."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    return (
        tok.join(F.broadcast(df), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("doc_freq") < _RARE_MAX_DF, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rare"),
        )
    )


# ---------------------------------------------------------------------------
# M85 — syllable-heuristic readability profile
# ---------------------------------------------------------------------------

#: Flesch-style avg-syllables-per-word bands, held as integer cross-
#: multiplications (n_syll*10 vs n_words*k) so the classification never
#: touches a float: <1.3 simple, <1.6 moderate, else complex.
_READ_SIMPLE_X10 = 13
_READ_MODERATE_X10 = 16


@register(
    "text_readability",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    per_doc AS (
      SELECT doc_id, lang,
             count(*) AS n_words,
             sum(len(regexp_extract_all(lower(token), '[aeiouy]+'))) AS n_syll
      FROM tok GROUP BY doc_id, lang
    ),
    classed AS (
      SELECT lang, n_words, n_syll,
             CASE WHEN n_syll * 10 < n_words * {_READ_SIMPLE_X10} THEN 'simple'
                  WHEN n_syll * 10 < n_words * {_READ_MODERATE_X10} THEN 'moderate'
                  ELSE 'complex' END AS readability
      FROM per_doc
    )
    SELECT lang, readability,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_syll) AS BIGINT) AS sum_syllables
    FROM classed GROUP BY lang, readability
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M85 — readability banding via the classic vowel-group syllable
    heuristic: syllables(word) ~= count of maximal [aeiouy]+ runs.  The
    Flesch-grade core (avg syllables per word) is a ratio of two exact
    integers, so the banding compares cross-multiplied integers and the
    whole profile is float-free.

    Scale: one token explode (the corpus scan), one map-side-combinable
    per-doc aggregate, one tiny (lang × band) rollup — no joins, no
    Python; regexp_count runs in whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    per_doc = tok.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(
            F.regexp_count(F.lower(F.col("token")), F.lit("[aeiouy]+"))
        ).alias("n_syll"),
    )
    readability = (
        F.when(
            F.col("n_syll") * 10 < F.col("n_words") * _READ_SIMPLE_X10, "simple"
        )
        .when(
            F.col("n_syll") * 10 < F.col("n_words") * _READ_MODERATE_X10, "moderate"
        )
        .otherwise("complex")
    )
    return (
        per_doc.withColumn("readability", readability)
        .groupBy("lang", "readability")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
            F.sum("n_syll").cast("bigint").alias("sum_syllables"),
        )
    )


# ---------------------------------------------------------------------------
# M94 — per-source token drift (over-representation flags)
# ---------------------------------------------------------------------------

_DRIFT_TOP = 5  # most over-represented tokens reported per source


@register(
    "text_source_drift",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    per AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY source, token
    ),
    tot AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS t FROM per GROUP BY source
    ),
    corpus AS (
      SELECT token, CAST(sum(n) AS BIGINT) AS n_all FROM per GROUP BY token
    ),
    grand AS (SELECT CAST(sum(t) AS BIGINT) AS g FROM tot),
    scored AS (
      SELECT p.source, p.token, p.n AS n_in_source,
             (c.n_all - p.n) AS n_elsewhere,
             round(CAST(p.n * (g.g - t.t) AS DOUBLE)
                   / ((c.n_all - p.n + 1) * t.t), 6) AS drift_ratio
      FROM per p
      JOIN tot t USING (source)
      JOIN corpus c USING (token)
      CROSS JOIN grand g
    )
    SELECT source, token, n_in_source, n_elsewhere, drift_ratio,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY drift_ratio DESC, token) AS rn
          FROM scored) ranked
    WHERE rn <= {_DRIFT_TOP}
    """,
)
def text_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M94 — distribution-drift audit: each source's {k} most over-
    represented tokens vs the rest of the corpus (rate_in_source /
    rate_elsewhere, add-one smoothed) — the contamination/bias smell
    test a data lead runs per ingest batch.  The ratio is ONE division
    of two exact BIGINTs (bit-identical both engines), then 6-dp
    rounded with a token tie-break before ranking (the repo's rank
    discipline).

    Scale: token counts are map-side combinable; the corpus and
    per-source total tables are vocabulary-/source-sized — broadcast
    enrichments over the (source, token) frame, which shuffles once;
    the final rank partitions by source."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
    per = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per.groupBy("source").agg(F.sum("n").cast("bigint").alias("t"))
    corpus = per.groupBy("token").agg(F.sum("n").cast("bigint").alias("n_all"))
    grand = tot.agg(F.sum("t").cast("bigint").alias("g"))
    scored = (
        per.join(F.broadcast(tot), "source")
        .join(F.broadcast(corpus), "token")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "token",
            F.col("n").alias("n_in_source"),
            (F.col("n_all") - F.col("n")).alias("n_elsewhere"),
            F.round(
                (F.col("n") * (F.col("g") - F.col("t"))).cast("double")
                / ((F.col("n_all") - F.col("n") + 1) * F.col("t")),
                6,
            ).alias("drift_ratio"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("drift_ratio").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _DRIFT_TOP)
    )


# ---------------------------------------------------------------------------
# M102 — BPE first-merge statistics: adjacent character-pair counts
# ---------------------------------------------------------------------------

_BPE_TOP = 10


@register(
    "text_bpe_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    pr AS (
      SELECT lang, substring(token, i, 2) AS pair
      FROM tok, (SELECT unnest(generate_series(1, 256)) AS i) g
      WHERE i <= len(token) - 1
    ),
    c AS (
      SELECT lang, pair, CAST(count(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2
    )
    SELECT lang, pair, n,
           CAST(row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, pair) AS BIGINT) AS rn
    FROM c QUALIFY rn <= {_BPE_TOP}
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M102 — the first iteration of BPE tokenizer training: count
    every adjacent character pair inside each whitespace token and
    rank the top {t} per language — the merge-candidate table a
    byte-pair-encoding vocab build reads on round one.

    Counts are exact integers; the rank orders on (count DESC, pair)
    — a total order, no rounded score.  Scale: explode is linear in
    corpus characters, the pair count is map-side combinable on a
    (lang, pair) key whose cardinality is alphabet², and the top-k
    window partitions by lang — the same shape as text_bigrams one
    level down."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.length("token") >= 2)
    pairs = tok.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
    )
    c = pairs.groupBy("lang", "pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("pair"))
    return (
        c.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _BPE_TOP)
    )


# ---------------------------------------------------------------------------
# M103 — Gopher-style document quality gates (integer cross-multiplied)
# ---------------------------------------------------------------------------


@register(
    "text_gopher_rules",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    st AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(len(token)) AS BIGINT) AS sum_len,
             CAST(sum(CASE WHEN regexp_matches(token, '[A-Za-z]')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
             CAST(count(DISTINCT token) AS BIGINT) AS n_unique
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_words,
           CAST(CASE WHEN n_words BETWEEN 20 AND 80 THEN 1 ELSE 0 END
                AS BIGINT) AS flag_nwords,
           CAST(CASE WHEN 3 * n_words <= sum_len AND sum_len <= 10 * n_words
                     THEN 1 ELSE 0 END AS BIGINT) AS flag_meanlen,
           CAST(CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END
                AS BIGINT) AS flag_alpha,
           CAST(CASE WHEN 4 * (n_words - n_unique) <= n_words THEN 1 ELSE 0 END
                AS BIGINT) AS flag_dup,
           CAST(CASE WHEN n_words BETWEEN 20 AND 80
                      AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
                      AND 5 * n_alpha >= 4 * n_words
                      AND 4 * (n_words - n_unique) <= n_words
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM st
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M103 — the published Gopher-style repetition/quality gate set
    (word-count band, mean-word-length band, alphabetic-word fraction,
    duplicate-unigram fraction), each as a 0/1 flag plus the combined
    keep decision.  Every threshold compares integers via
    cross-multiplication (mean len in [3,10] ⇔ 3n <= Σlen <= 10n;
    alpha >= 0.8 ⇔ 5·n_alpha >= 4n; dup <= 0.25 ⇔ 4(n−uniq) <= n) —
    no ratio is ever materialized, so no float crosses the engine
    boundary.

    Scale: one explode + one map-side-combinable per-doc aggregate
    (count-distinct partials on the doc key); flags are projections.
    Complements text_quality_score (additive score) with the
    hard-gate shape production filters actually use."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    st = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum(F.length("token")).cast("bigint").alias("sum_len"),
        F.sum(
            F.when(F.col("token").rlike("[A-Za-z]"), 1).otherwise(0)
        ).cast("bigint").alias("n_alpha"),
        F.countDistinct("token").cast("bigint").alias("n_unique"),
    )
    n = F.col("n_words")
    f_nwords = (n >= 20) & (n <= 80)
    f_meanlen = (3 * n <= F.col("sum_len")) & (F.col("sum_len") <= 10 * n)
    f_alpha = 5 * F.col("n_alpha") >= 4 * n
    f_dup = 4 * (n - F.col("n_unique")) <= n
    as_flag = lambda cond: F.when(cond, 1).otherwise(0).cast("bigint")  # noqa: E731
    return st.select(
        "doc_id",
        "n_words",
        as_flag(f_nwords).alias("flag_nwords"),
        as_flag(f_meanlen).alias("flag_meanlen"),
        as_flag(f_alpha).alias("flag_alpha"),
        as_flag(f_dup).alias("flag_dup"),
        as_flag(f_nwords & f_meanlen & f_alpha & f_dup).alias("keep"),
    )


# ---------------------------------------------------------------------------
# M164 — token-rank commonness score (unigram-LM proxy, exact integers)
# ---------------------------------------------------------------------------


@register(
    "text_token_rank_score",
    oracle="""
    WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents),
    vocab AS (SELECT token, count(*) AS freq FROM tk GROUP BY token),
    rk AS (SELECT token,
                  row_number() OVER (ORDER BY freq DESC, token) AS rank
           FROM vocab),
    per AS (SELECT tk.doc_id, count(*) AS n_tokens, sum(rk.rank) AS sum_rank
            FROM tk JOIN rk USING (token) GROUP BY tk.doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_rank AS BIGINT) AS sum_rank,
           CAST((100 * sum_rank) // n_tokens AS BIGINT) AS mean_rank_x100
    FROM per
    """,
)
def text_token_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M164 — per-document mean corpus-frequency RANK of its tokens
    (rank 1 = most common; unique token tie-break), an exact-integer
    proxy for unigram-LM surprisal: documents full of rare tokens
    score high and are candidates for the M44/M103 quality gates,
    without needing log-probabilities (whose floats would break the
    hash).  Same family as M67's rare-token rate but graded, not
    thresholded.  Scale: the vocabulary is tiny next to the corpus —
    its global rank is one sort of O(vocab) rows, then a broadcastable
    (token, rank) join back onto the token stream; the per-doc agg is
    map-side combinable."""
    d = load(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    # vocab feeds BOTH the gate count and the rank (DOUBLE-REFERENCE
    # RULE) — materialize once; it is the small distinct-token frame.
    vocab = iter_materialize(tk.groupBy("token").agg(F.count(F.lit(1)).alias("freq")))
    rk = vocab.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(F.pmod(F.col("freq"), F.lit(1))).orderBy(
                F.col("freq").desc(), F.col("token")
            )
        ),
    ).select("token", "rank")
    # Broadcast the rank table only when the VOCABULARY is small — the
    # broadcast side is (token, rank), so gating on the document count
    # (a conservative proxy, vocab <= tokens) over-disabled the
    # broadcast on long-document corpora (VERDICT r5 item 4).
    from tropology_spark.operators.graph import BROADCAST_NODE_LIMIT

    if vocab.count() <= BROADCAST_NODE_LIMIT:
        rk = F.broadcast(rk)
    per = (
        tk.join(rk, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("rank").cast("bigint").alias("sum_rank"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "sum_rank",
        F.expr("(100 * sum_rank) div n_tokens").cast("bigint").alias("mean_rank_x100"),
    )


# ---------------------------------------------------------------------------
# M166 — blocking-key cost profile (J2's own cost model as a query)
# ---------------------------------------------------------------------------


@register(
    "text_prefix_block_profile",
    oracle="""
    WITH b AS (
      SELECT substring(text, 1, 40) AS pfx,
             count(*) AS sz,
             count(DISTINCT md5(text)) AS n_distinct
      FROM documents GROUP BY pfx
    )
    SELECT CAST(sz AS BIGINT) AS block_size,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(sum(n_distinct) AS BIGINT) AS distinct_texts
    FROM b GROUP BY sz
    """,
)
def text_prefix_block_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M166 — the J2 blocking key's COST MODEL as a query: block-size
    histogram of the 40-char-prefix blocks with the exact candidate
    pair count Σ C(size, 2) each size class contributes.  This is the
    table that says whether prefix blocking is viable at the next
    scale-up BEFORE running the pair join — a single size-10⁵ block in
    the profile means 5·10⁹ candidate pairs and a switch to LSH (the
    M47 skew-profile discipline applied to the dedup family's own
    key).  Scale: one map-side-combinable rollup on the prefix, then a
    ~20-key histogram; no pair is ever generated."""
    d = load(spark, sf_dir, "documents")
    b = d.groupBy(F.substring(F.col("text"), 1, 40).alias("pfx")).agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
    )
    return (
        b.groupBy(F.col("sz").cast("bigint").alias("block_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum(F.expr("sz * (sz - 1) div 2")).cast("bigint").alias("candidate_pairs"),
            F.sum("n_distinct").cast("bigint").alias("distinct_texts"),
        )
    )


# ---------------------------------------------------------------------------
# M172 — character-trigram profile per language (langid training table)
# ---------------------------------------------------------------------------


@register(
    "text_char_trigram_profile",
    oracle="""
    WITH g AS (
      SELECT lang, substr(tx, CAST(i AS INTEGER), 3) AS tri
      FROM (
        SELECT lang, lower(text) AS tx,
               unnest(range(1, length(text) - 1)) AS i
        FROM documents WHERE length(text) >= 3
      )
    ),
    c AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS cnt
          FROM g GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total
            FROM c GROUP BY 1),
    r AS (
      SELECT c.lang, c.tri, c.cnt, tot.total,
             row_number() OVER (PARTITION BY c.lang
                                ORDER BY c.cnt DESC, c.tri) AS rn
      FROM c JOIN tot ON c.lang = tot.lang
    )
    SELECT lang, tri, cnt,
           CAST((1000000 * cnt) // total AS BIGINT) AS rate_ppm
    FROM r WHERE rn <= 10
    """,
)
def text_char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M172 — per-language character-trigram frequency profile: the
    top-10 overlapping char trigrams of each language's lowercased
    text with an integer-ppm rate — exactly the training table the
    M3 n-gram language identifier consumes (M3 ships a FIXED profile;
    this query is how that profile is (re)built from a labeled
    corpus).  Rate = (10⁶·cnt) div total trigrams of the language —
    positive integers, engine-identical division; rank tie-break on
    the trigram string (the unique-key rank discipline).

    Both engines enumerate positions 1..len-2 and take 3-char
    substrings — character (not byte) semantics in both, so multi-byte
    scripts profile identically.  Spark generates the trigram array
    JVM-side (``transform(sequence(...))``, whole-stage codegen — no
    Python in the loop) and explodes once.

    Scale: the explode is inherently O(total chars) — the same cost
    class as tokenization, one linear pass.  Trigram counts combine
    map-side into an O(langs × |Σ|³)-bounded table; the per-lang
    total and top-10 rank then operate on that small aggregate inside
    the lang partition.  One wide shuffle on (lang, tri), nothing
    corpus-proportional after it."""
    d = load(spark, sf_dir, "documents")
    g = (
        d.filter(F.length("text") >= 3)
        .select("lang", F.lower(F.col("text")).alias("tx"))
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(tx) - 2), "
                    "i -> substring(tx, i, 3))"
                )
            ).alias("tri"),
        )
    )
    c = g.groupBy("lang", "tri").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = c.groupBy("lang").agg(F.sum("cnt").cast("bigint").alias("total"))
    rk = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tri"))
    return (
        c.join(F.broadcast(tot), "lang")
        .withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") <= 10)
        .select(
            "lang", "tri", "cnt",
            F.expr("(1000000 * cnt) div total").cast("bigint").alias("rate_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# M179 — cross-source vocabulary overlap (Jaccard matrix)
# ---------------------------------------------------------------------------


@register(
    "text_vocab_jaccard_sources",
    oracle="""
    WITH tk AS (
      SELECT DISTINCT source, token
      FROM (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents)
    ),
    vs AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab
           FROM tk GROUP BY source),
    pair AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM tk a JOIN tk b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_common,
           va.vocab AS vocab_a, vb.vocab AS vocab_b,
           CAST((1000000 * n_common)
                // (va.vocab + vb.vocab - n_common) AS BIGINT) AS jaccard_ppm
    FROM pair
    JOIN vs va ON va.source = source_a
    JOIN vs vb ON vb.source = source_b
    ORDER BY jaccard_ppm DESC, source_a, source_b LIMIT 20
    """,
)
def text_vocab_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M179 — pairwise vocabulary overlap between sources: Jaccard
    (in integer ppm — counts are positive, the CLAUDE.md division
    rule) over each source's distinct token set, top-20 closest
    pairs.  The M94 drift audit asks "which tokens shifted"; this
    asks the coarser curation question — which SOURCES are lexically
    near-duplicates of each other and are candidates for mixture
    re-weighting (M87) before one corpus double-counts a domain.

    Scale: the corpus collapses to distinct (source, token)
    immediately (map-side combine).  The pair join is token-keyed
    over vocabulary-sized frames — O(vocab × sources-sharing-token)
    with sources bounded (~tens), never O(corpus²); per-source vocab
    sizes broadcast onto the C(sources,2)-row pair table.  A
    stop-word-dominated token shared by ALL sources contributes
    C(sources,2) rows — bounded by the source count, the same
    bounded-explosion argument as M173's baskets."""
    d = load(spark, sf_dir, "documents")
    tk = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
    )
    tk = iter_materialize(tk)  # feeds vocab sizes AND both join sides
    vs = tk.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    a, b = tk.alias("a"), tk.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    res = (
        pair.join(
            F.broadcast(vs.withColumnRenamed("vocab", "vocab_a")),
            F.col("source_a") == F.col("source"),
        )
        .drop("source")
        .join(
            F.broadcast(vs.withColumnRenamed("vocab", "vocab_b")),
            F.col("source_b") == F.col("source"),
        )
        .drop("source")
        .select(
            "source_a", "source_b", "n_common", "vocab_a", "vocab_b",
            F.expr("(1000000 * n_common) div (vocab_a + vocab_b - n_common)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )
    return res.orderBy(
        F.desc("jaccard_ppm"), F.asc("source_a"), F.asc("source_b")
    ).limit(20)


# ---------------------------------------------------------------------------
# M183 — RAKE-style keyword extraction (stopword-delimited phrases)
# ---------------------------------------------------------------------------


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH w0 AS (
      SELECT doc_id, i AS pos, l[i] AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l)
    ),
    nw AS (
      SELECT doc_id, pos, token,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM w0
      WHERE token NOT IN {tuple(_STOPWORDS)} AND token <> ''
    ),
    plen AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen
             FROM nw GROUP BY doc_id, grp),
    ws AS (
      SELECT nw.token,
             CAST((1000000 * sum(p.plen)) // count(*) AS BIGINT) AS score_ppm
      FROM nw JOIN plen p ON nw.doc_id = p.doc_id AND nw.grp = p.grp
      GROUP BY nw.token
    ),
    phr AS (
      SELECT nw.doc_id, nw.grp,
             string_agg(nw.token, ' ' ORDER BY nw.pos) AS phrase,
             CAST(sum(ws.score_ppm) AS BIGINT) AS score_ppm,
             CAST(count(*) AS BIGINT) AS n_words
      FROM nw JOIN ws ON nw.token = ws.token
      GROUP BY nw.doc_id, nw.grp
    ),
    agg AS (
      SELECT phrase,
             CAST(max(n_words) AS BIGINT) AS n_words,
             CAST(max(score_ppm) AS BIGINT) AS score_ppm,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM phr GROUP BY phrase
    )
    SELECT phrase, n_words, score_ppm, n_occurrences
    FROM agg ORDER BY score_ppm DESC, phrase LIMIT 20
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M183 — RAKE keyword extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs (M170's
    gaps-and-islands trick applied to token POSITIONS — island key =
    pos − row_number over non-stop tokens); each word scores
    degree/frequency where degree sums the lengths of every phrase
    the word appears in; a phrase scores the sum of its word scores.
    All arithmetic is exact integers — per-word score is ONE integer
    division (10⁶·deg) div freq on positive counts, phrase scores are
    sums of those — and the top-20 breaks ties on the phrase string.

    Scale: positions come from one posexplode (O(tokens), the
    tokenization cost class); islands, phrase lengths and phrase
    reassembly all live inside the doc_id partition; the word-score
    table is vocabulary-sized and broadcasts onto the phrase rows.
    Phrase reassembly collects per-(doc, island) structs — bounded by
    document length, the M173 bounded-collect argument."""
    d = load(spark, sf_dir, "documents")
    w0 = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )
    wn = Window.partitionBy("doc_id").orderBy("pos")
    nw = iter_materialize(  # feeds plen, word scores AND phrase rows
        w0.filter(~F.col("token").isin(*_STOPWORDS) & (F.col("token") != ""))
        .withColumn("grp", F.col("pos") - F.row_number().over(wn))
    )
    plen = nw.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen")
    )
    ws = (
        nw.join(plen, ["doc_id", "grp"])
        .groupBy("token")
        .agg(
            F.expr("(1000000 * sum(plen)) div count(1)")
            .cast("bigint")
            .alias("score_ppm")
        )
    )
    phr = (
        nw.join(F.broadcast(ws), "token")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("phrase"),
            F.sum("score_ppm").cast("bigint").alias("score_ppm"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
    )
    agg = phr.groupBy("phrase").agg(
        F.max("n_words").cast("bigint").alias("n_words"),
        F.max("score_ppm").cast("bigint").alias("score_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
    )
    return agg.select("phrase", "n_words", "score_ppm", "n_occurrences").orderBy(
        F.desc("score_ppm"), F.asc("phrase")
    ).limit(20)


# ---------------------------------------------------------------------------
# M198 — test-split n-gram novelty vs the train split
# ---------------------------------------------------------------------------


@register(
    "text_ngram_novelty",
    oracle="""
    WITH b AS (
      SELECT lang, text,
             ((strpos('0123456789abcdef',
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef',
                       substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 10
               AS bucket
      FROM documents
    ),
    g AS (
      SELECT lang,
             l[i] || ' ' || l[i + 1] AS bigram,
             bucket < 8 AS in_train,
             bucket = 9 AS in_test
      FROM (SELECT lang, string_split(text, ' ') AS l, bucket
            FROM b WHERE bucket < 8 OR bucket = 9),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    d AS (
      SELECT lang, bigram,
             max(CASE WHEN in_train THEN 1 ELSE 0 END) AS has_train,
             max(CASE WHEN in_test THEN 1 ELSE 0 END) AS has_test
      FROM g GROUP BY lang, bigram
    )
    SELECT lang,
           CAST(sum(has_test) AS BIGINT) AS n_test_bigrams,
           CAST(sum(CASE WHEN has_test = 1 AND has_train = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(CASE WHEN sum(has_test) = 0 THEN NULL
                     ELSE (1000000 * sum(CASE WHEN has_test = 1
                                              AND has_train = 0
                                              THEN 1 ELSE 0 END))
                          // sum(has_test)
                END AS BIGINT) AS novelty_ppm
    FROM d GROUP BY lang
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M198 — per-language test-set bigram novelty: the fraction of
    DISTINCT bigram types in the test split (M26's md5 buckets: <8
    train, =9 test) that never occur in the train split — the
    generalization-gap number an eval-contamination review reads next
    to M25's contamination rate (which asks the opposite question:
    what leaked IN; this asks what the model never saw).

    One pass: each (lang, bigram) key aggregates two max-flags
    (seen-in-train, seen-in-test) — no anti-join, no second scan; the
    novelty set is ``has_test AND NOT has_train``.  The bigram
    enumeration is the J6 zip idiom; the split is the exact M26 bucket
    expression, so this audit composes with every other split-keyed
    query.  Counts are distinct-type counts (exact integers) and the
    ppm is one integer division of non-negatives.

    Scale: explode → one shuffle on (lang, bigram) with map-side
    combine to the flag pair; the per-lang rollup is a handful of
    keys.  No stage is pair-quadratic."""
    d = load(spark, sf_dir, "documents")
    md5 = F.md5(F.col("doc_id").cast("string"))
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("int") % 10
    b = d.select(
        "lang", "text", bucket.alias("bucket")
    ).filter((F.col("bucket") < 8) | (F.col("bucket") == 9))
    toked = b.select(
        "lang",
        (F.col("bucket") < 8).alias("in_train"),
        (F.col("bucket") == 9).alias("in_test"),
        F.split(F.col("text"), " ").alias("t"),
    )
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    g = toked.select(
        "lang", "in_train", "in_test", F.explode(bigrams).alias("bigram")
    )
    dd = g.groupBy("lang", "bigram").agg(
        F.max(F.when(F.col("in_train"), 1).otherwise(0)).alias("has_train"),
        F.max(F.when(F.col("in_test"), 1).otherwise(0)).alias("has_test"),
    )
    return dd.groupBy("lang").agg(
        F.sum("has_test").cast("bigint").alias("n_test_bigrams"),
        F.sum(
            F.when((F.col("has_test") == 1) & (F.col("has_train") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_novel"),
        # A language with no test-split docs (tiny fixtures) has an
        # undefined novelty — NULL in both engines, never a
        # divide-by-zero under ANSI.
        F.expr(
            "CASE WHEN sum(has_test) = 0 THEN NULL"
            " ELSE (1000000 * sum(CASE WHEN has_test = 1 AND has_train = 0"
            " THEN 1 ELSE 0 END)) div sum(has_test) END"
        )
        .cast("bigint")
        .alias("novelty_ppm"),
    )


# ---------------------------------------------------------------------------
# M202 — cross-document boilerplate blocks per source
# ---------------------------------------------------------------------------


#: Guarded block enumeration (single home, pinned by tests/
#: test_units.py): for docs with < 8 tokens Spark's sequence(1, 0) is
#: the DESCENDING [1, 0] (default step -1), which would emit a partial
#: block plus an empty one while the oracle's `WHERE 8*i <= len(l)`
#: emits nothing (ADVICE r6).  explode drops the empty array, so short
#: docs contribute no rows on either side.
_BLOCKS_EXPR = (
    "CASE WHEN size(l) >= 8 THEN"
    " transform(sequence(1, size(l) div 8),"
    " i -> array_join(slice(l, 8 * (i - 1) + 1, 8), ' '))"
    " ELSE array() END"
)


@register(
    "text_boilerplate_blocks",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
    ),
    b AS (
      SELECT doc_id, source,
             array_to_string(l[(8 * (i - 1) + 1):(8 * i)], ' ') AS block
      FROM t, (SELECT unnest(generate_series(1, 512)) AS i)
      WHERE 8 * i <= len(l)
    ),
    g AS (
      SELECT block, source,
             CAST(count(*) AS BIGINT) AS n_inst,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM b GROUP BY 1, 2
    ),
    w AS (
      SELECT *, CAST(sum(n_docs) OVER (PARTITION BY block) AS BIGINT)
                  AS g_docs
      FROM g
    )
    SELECT source,
           CAST(sum(n_inst) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN g_docs >= 2 THEN n_inst ELSE 0 END)
                AS BIGINT) AS n_boiler,
           CAST((1000000 * sum(CASE WHEN g_docs >= 2 THEN n_inst ELSE 0 END))
                // sum(n_inst) AS BIGINT) AS boiler_ppm
    FROM w GROUP BY source
    """,
)
def text_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M202 — per-source boilerplate rate: the share of a source's
    non-overlapping 8-token blocks that also appear in at least one
    OTHER document — the cross-document twin of M125's within-document
    dup-span (C4/RefinedWeb drop nav bars, license footers, and
    templated headers exactly this way: a block repeated across
    documents is boilerplate, not content).  A block counts as
    boilerplate when its distinct-document count over the whole corpus
    is ≥ 2; per-source instance counts then give the removable-token
    ppm that feeds M87's mixture weights.

    The global per-block document count comes from a window over the
    (block, source) aggregate — partitions bounded by the source count
    per block, no self-join, no second scan (sources partition
    documents, so summing per-source distinct-doc counts IS the global
    distinct count).

    Scale: explode is 1/8 of token volume; one shuffle to (block,
    source) with map-side combine, one narrow window, and a 20-key
    rollup.  Hot blocks (the boilerplate itself) are exactly the skew
    the (block, source) pre-aggregation absorbs."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("l")
    )
    b = t.select(
        "doc_id", "source", F.explode(F.expr(_BLOCKS_EXPR)).alias("block")
    )
    g = b.groupBy("block", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inst"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    w = g.withColumn(
        "g_docs",
        F.sum("n_docs").over(Window.partitionBy("block")).cast("bigint"),
    )
    return w.groupBy("source").agg(
        F.sum("n_inst").cast("bigint").alias("n_blocks"),
        F.sum(F.when(F.col("g_docs") >= 2, F.col("n_inst")).otherwise(0))
        .cast("bigint")
        .alias("n_boiler"),
        F.expr(
            "(1000000 * sum(CASE WHEN g_docs >= 2 THEN n_inst ELSE 0 END))"
            " div sum(n_inst)"
        )
        .cast("bigint")
        .alias("boiler_ppm"),
    )


# ---------------------------------------------------------------------------
# M208 — hashing-trick feature vectors (vocabulary-free bag of words)
# ---------------------------------------------------------------------------

_HASH_DOCS = 20
_HASH_BUCKETS = 256


@register(
    "text_hashed_features",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < {_HASH_DOCS}
    )
    SELECT doc_id,
           CAST(('0x' || substring(md5(token), 1, 8))::BIGINT
                % {_HASH_BUCKETS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM tok GROUP BY 1, 2
    """,
)
def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M208 — the HASHING TRICK (Weinberger et al. 2009): sparse
    bag-of-words features with NO vocabulary table — each token maps
    to bucket md5-low-32 mod {_HASH_BUCKETS} and features are
    per-(doc, bucket) term frequencies.  This is how a 100 TB corpus
    gets featurized without the global vocab build (M45) that
    dominates classic TF-IDF: the "vocab" is a pure hash function, so
    featurization is embarrassingly parallel, streaming-safe, and new
    tokens never change the schema.  Bounded serving shape (doc_id <
    {_HASH_DOCS}) keeps the declared output audit-sized.

    The bucket hash is the portable md5-low-32 idiom (M43/J3) —
    identical in both engines, non-negative, so ``%`` agrees.

    Scale: filter pushes to the scan; explode → one (doc, bucket)
    rollup with map-side combine.  Collisions are the method's
    documented trade (256 buckets here; production uses 2²⁰) — the
    audit of collision load is one groupBy away."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _HASH_DOCS)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("bigint")
        % _HASH_BUCKETS
    )
    return tok.groupBy(
        "doc_id", bucket.cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("tf"))


# ---------------------------------------------------------------------------
# M221 — two-round iterative BPE merge (chr(1)-sentinel replace)
# ---------------------------------------------------------------------------

_BPE2_TOP = 10


@register(
    "text_bpe_merge2",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    p1 AS (
      SELECT substring(token, i, 2) AS pair
      FROM tok, (SELECT unnest(generate_series(1, 256)) AS i) g
      WHERE i <= len(token) - 1
    ),
    c1 AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p1 GROUP BY 1),
    t1 AS (SELECT pair FROM c1 ORDER BY n DESC, pair LIMIT 1),
    m AS (
      SELECT replace(token, (SELECT pair FROM t1), chr(1)) AS token FROM tok
    ),
    p2 AS (
      SELECT substring(token, i, 2) AS pair
      FROM m, (SELECT unnest(generate_series(1, 256)) AS i) g
      WHERE i <= len(token) - 1
    ),
    c2 AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p2 GROUP BY 1),
    r1 AS (SELECT 1 AS merge_round, pair, n,
                  row_number() OVER (ORDER BY n DESC, pair) AS rn
           FROM c1),
    r2 AS (SELECT 2 AS merge_round, pair, n,
                  row_number() OVER (ORDER BY n DESC, pair) AS rn
           FROM c2)
    SELECT CAST(merge_round AS BIGINT) AS merge_round,
           replace(pair, chr(1), '*') AS pair, n, CAST(rn AS BIGINT) AS rn
    FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
    WHERE rn <= {_BPE2_TOP}
    """,
)
def text_bpe_merge2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M221 — BPE tokenizer training, rounds one AND two: count
    adjacent character pairs (M102's table, corpus-global), MERGE the
    winning pair everywhere, and re-count pairs over the merged
    symbols — the top-{t} merge-candidate tables of both rounds.  The
    merge itself is ``replace(token, top_pair, chr(1))``: string
    replace is left-to-right non-overlapping in BOTH engines
    (verified live: replace('aaaa','aa',chr(1)) → two sentinels),
    which IS the BPE merge step, and the one-char sentinel keeps
    round-2 symbols single characters so the same substring
    enumeration re-counts pairs.  Round-2 pairs containing the merged
    symbol surface with '*' in place of the sentinel (the fixture
    alphabet is space + lowercase letters, so '*' is collision-free).

    Determinism: the winner is the (count DESC, pair) total order —
    a LIMIT 1 over exact integers; rank windows ride the bounded
    (≤ alphabet²+2·alphabet) pair axis on the pmod constant key (the
    global_order.py idiom — no partition-less WindowExec).

    Scale: two linear explode+count passes (map-side combinable on a
    bounded key), the winner broadcast into the merge projection; the
    round-1 count table feeds both its rank and the winner —
    checkpointed once (DOUBLE-REFERENCE RULE; the token frame is a
    pure scan projection, so its two readers each re-scan rather than
    checkpoint a corpus-sized frame).  A full vocab build iterates
    this shape k times — each round is one scan + one bounded
    shuffle, the production BPE-training recurrence."""
    from tropology_spark.session import iter_materialize

    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))

    def pair_counts(frame: DataFrame) -> DataFrame:
        return (
            frame.filter(F.length("token") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(token) - 1),"
                        " i -> substring(token, i, 2))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    c1 = iter_materialize(pair_counts(tok))
    t1 = (
        c1.orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("mpair"))
    )
    merged = tok.crossJoin(F.broadcast(t1)).select(
        F.expr("replace(token, mpair, char(1))").alias("token")
    )
    c2 = pair_counts(merged)
    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.desc("n"), F.asc("pair")
    )

    def ranked(c: DataFrame, rnd: int) -> DataFrame:
        return (
            c.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= _BPE2_TOP)
            .select(
                F.lit(rnd).cast("bigint").alias("merge_round"),
                F.expr("replace(pair, char(1), '*')").alias("pair"),
                "n",
                "rn",
            )
        )

    return ranked(c1, 1).unionByName(ranked(c2, 2))


text_bpe_merge2.__doc__ = text_bpe_merge2.__doc__.format(t=_BPE2_TOP)


# ---------------------------------------------------------------------------
# M227 text_bpe_vocab4 — four unrolled BPE merge rounds (M221 extended)
# ---------------------------------------------------------------------------

_BPE4_ROUNDS = 4
_BPE4_TOP = 10


def _bpe4_oracle() -> str:
    """Chained M221 CTEs: counts -> top-1 -> chr(r)-sentinel merge,
    four times; sentinels display as the digits '1'..'4' (absent from
    the fixture alphabet of space + lowercase letters)."""
    parts = [
        """
    WITH m0 AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    """
    ]
    for r in range(1, _BPE4_ROUNDS + 1):
        parts.append(f"""
    , p{r} AS (
      SELECT substring(token, i, 2) AS pair
      FROM m{r - 1}, (SELECT unnest(generate_series(1, 256)) AS i) g{r}
      WHERE i <= len(token) - 1
    ),
    c{r} AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p{r} GROUP BY 1),
    t{r} AS (SELECT pair FROM c{r} ORDER BY n DESC, pair LIMIT 1),
    m{r} AS (SELECT replace(token, (SELECT pair FROM t{r}), chr({r})) AS token
             FROM m{r - 1})
    """)
    disp = "pair"
    for r in range(1, _BPE4_ROUNDS + 1):
        disp = f"replace({disp}, chr({r}), '{r}')"
    ranked = "\n      UNION ALL ".join(
        f"SELECT {r} AS merge_round, pair, n,"
        f" row_number() OVER (ORDER BY n DESC, pair) AS rn FROM c{r}"
        for r in range(1, _BPE4_ROUNDS + 1)
    )
    parts.append(f"""
    , ranked AS (
      {ranked}
    )
    SELECT CAST(merge_round AS BIGINT) AS merge_round, {disp} AS pair, n,
           CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_BPE4_TOP}
    """)
    return "".join(parts)


@register("text_bpe_vocab4", oracle=_bpe4_oracle())
def text_bpe_vocab4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M227 — M221 extended to FOUR unrolled BPE merge rounds:
    each round counts adjacent symbol pairs, merges the (count DESC,
    pair) winner everywhere via the chr(r) sentinel (the round-8
    verified left-to-right non-overlapping ``replace``), and re-counts
    — the first four rows of a BPE vocabulary build, with each round's
    top-{t} candidate table emitted.  Sentinels surface as digits
    '1'..'4' (collision-free against the letters-only fixture
    alphabet; injective, unlike a shared '*').

    Scale: per round one linear explode+count on a bounded key and a
    1-row broadcast winner — the production BPE recurrence is k
    iterations of exactly this; each count table feeds its rank AND
    the winner, so each is checkpointed (DOUBLE-REFERENCE RULE),
    while the token frames chain linearly (single reference each)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))

    def pair_counts(frame: DataFrame) -> DataFrame:
        return (
            frame.filter(F.length("token") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(token) - 1),"
                        " i -> substring(token, i, 2))"
                    )
                ).alias("pair")
            )
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.desc("n"), F.asc("pair")
    )
    disp_sql = "pair"
    for r in range(1, _BPE4_ROUNDS + 1):
        disp_sql = f"replace({disp_sql}, char({r}), '{r}')"

    cur = toks
    ranked_parts: list[DataFrame] = []
    for r in range(1, _BPE4_ROUNDS + 1):
        c = iter_materialize(pair_counts(cur))
        ranked_parts.append(
            c.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= _BPE4_TOP)
            .select(
                F.lit(r).cast("bigint").alias("merge_round"),
                F.expr(disp_sql).alias("pair"),
                "n",
                "rn",
            )
        )
        top = (
            c.orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .select(F.col("pair").alias("mpair"))
        )
        cur = cur.crossJoin(F.broadcast(top)).select(
            F.expr(f"replace(token, mpair, char({r}))").alias("token")
        )
    out = ranked_parts[0]
    for p in ranked_parts[1:]:
        out = out.unionByName(p)
    return out


text_bpe_vocab4.__doc__ = text_bpe_vocab4.__doc__.format(t=_BPE4_TOP)


# ---------------------------------------------------------------------------
# M240 text_lang_confusion — language-ID confusion matrix (model eval)
# ---------------------------------------------------------------------------


def _lang_confusion_oracle() -> str:
    from tropology_spark.registry import ORACLES

    return f"""
    WITH pred AS ({ORACLES['text_langid_nb']}),
    c AS (
      SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    )
    SELECT true_lang, pred_lang, n,
           CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS n_true,
           CAST((1000000 * n) //
                sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS share_ppm
    FROM c
    """


@register("text_lang_confusion", oracle=_lang_confusion_oracle())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M240 — the CONFUSION MATRIX of the M3 language
    identifier against the stored labels: (true, predicted) counts
    with the per-true-language total and row share in ppm — the
    model-evaluation table every classifier in the pipeline needs
    (diagonal = per-language recall; off-diagonal = which languages
    the n-gram model confuses).  The repo's recall-audit discipline
    (sim_ann_recall et al.) applied to the TEXT family's model.

    Composed, not copied: the oracle wraps ORACLES['text_langid_nb']
    verbatim and the Spark side runs the registered M3 query.

    Scale: the expensive part is the classifier itself (already
    bounded — M3's n×L score join); the matrix is an L² rollup with
    map-side combine and an L-partitioned window.  ppm is positive-
    integer div (cross-engine exact)."""
    from tropology_spark.registry import QUERIES

    pred = QUERIES["text_langid_nb"](spark, sf_dir)
    c = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("true_lang")
    return c.select(
        "true_lang",
        "pred_lang",
        "n",
        F.sum("n").over(w).cast("bigint").alias("n_true"),
        F.expr("(1000000 * n) div (sum(n) OVER (PARTITION BY true_lang))")
        .cast("bigint")
        .alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# M246 text_pmi_collocations — integer-carrier PMI collocation ranking
# ---------------------------------------------------------------------------

_PMI_MIN_N = 3
_PMI_TOP = 50


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT l[i] AS x, l[i + 1] AS y
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    big AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM toks GROUP BY x, y),
    uni AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
      ) GROUP BY token
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    )),
    scored AS (
      SELECT b.x, b.y, b.n_xy, ux.n AS n_x, uy.n AS n_y,
             CAST((1000000 * CAST(b.n_xy AS HUGEINT) * tot.n_tokens)
                  // (CAST(ux.n AS HUGEINT) * uy.n) AS BIGINT) AS lift_ppm
      FROM big b JOIN uni ux ON b.x = ux.token
                 JOIN uni uy ON b.y = uy.token
                 CROSS JOIN tot
      WHERE b.n_xy >= {_PMI_MIN_N}
    )
    SELECT x, y, n_xy, n_x, n_y, lift_ppm,
           CAST(row_number() OVER (ORDER BY lift_ppm DESC, x, y) AS BIGINT)
             AS rn
    FROM scored
    QUALIFY rn <= {_PMI_TOP}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M246 — COLLOCATION mining by pointwise mutual
    information: adjacent word pairs seen ≥ {m} times, scored by the
    exact-integer PMI lift  n_xy·N / (n_x·n_y)  in ppm (PMI's log is
    monotone in the lift, so ranking by the integer lift IS ranking by
    PMI with no float carrier), top-{t} by (lift DESC, pair) — the
    phrase detector feeding tokenizer vocabularies and stop-phrase
    lists.  The product 10⁶·n_xy·N is computed in DECIMAL(38,0) /
    HUGEINT (the M192 wide-integer finale rule, per ADVICE r9: at
    ~3e6+ tokens a frequent bigram overflows BIGINT — DuckDB raises
    while non-ANSI Spark wraps silently); the BIGINT quotient is safe
    (lift ≤ 10⁶·N).  J6's bigram extraction idiom (zip-with, oracle
    enumerates positions at the 4096 cap) + J4's unigram counts; the
    corpus total is a 1-row broadcast.

    Scale: two token passes collapse to count tables; the scoring
    join keys bigrams to their two unigram rows (shuffle on tokens —
    Zipf-skewed, but the ≥{m} filter prunes the long tail before the
    join); the final rank is a TakeOrdered over the filtered
    survivors."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(F.split(F.col("text"), " ").alias("l"))
    pairs = F.zip_with(
        F.slice(F.col("l"), 1, F.greatest(F.size(F.col("l")) - 1, F.lit(0))),
        F.slice(F.col("l"), 2, F.greatest(F.size(F.col("l")) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
    )
    big = (
        toked.select(F.explode(pairs).alias("p"))
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
        .filter(F.col("n_xy") >= _PMI_MIN_N)
    )
    uni = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    scored = (
        big.join(uni.select(F.col("token").alias("x"), F.col("n").alias("n_x")), "x")
        .join(uni.select(F.col("token").alias("y"), F.col("n").alias("n_y")), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x", "y", "n_xy", "n_x", "n_y",
            F.expr(
                "(CAST(1000000 AS DECIMAL(38,0)) * n_xy * n_tokens)"
                " div (CAST(n_x AS DECIMAL(38,0)) * n_y)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )
    w = Window.partitionBy(F.pmod(F.col("n_xy"), F.lit(1))).orderBy(
        F.desc("lift_ppm"), F.asc("x"), F.asc("y")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _PMI_TOP)
    )


text_pmi_collocations.__doc__ = text_pmi_collocations.__doc__.format(
    m=_PMI_MIN_N, t=_PMI_TOP
)


# ---------------------------------------------------------------------------
# M259 text_winnowing_fingerprints — MOSS winnowing selection density
# ---------------------------------------------------------------------------

_WIN_W = 4  # window of consecutive k-gram hashes


def winnowing_selected(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    w: int = _WIN_W,
) -> DataFrame:
    """The winnowing SELECTION frame ``(doc_id, n_grams, mh)`` —
    distinct trigram hashes that are the minimum of some full
    ``w``-window (default the registered 4) — the single home of the
    window-min arithmetic, shared by the registered rollup, the
    containment-guarantee property test, and the registered w-curve
    text_winnowing_w_curve (M312)
    (``docs=`` substitutes a (doc_id, text) frame).  The window
    min is computed over ALL gram rows BEFORE the full-window filter —
    the subquery-order rule the oracle pins.  Selections NEST across
    window sizes (the min of a w2-window is also the min of the
    w1-subwindow containing its argmin, for w1 ≤ w2) — the
    property suite (tests/test_r15_twins.py) pins
    Selected(w2) ⊆ Selected(w1)."""
    g = _winnow_grams(docs if docs is not None else load(spark, sf_dir, "documents"))
    win = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    wm = g.select("doc_id", "n_grams", "i", F.min("h").over(win).alias("mh"))
    return (
        wm.filter(F.col("i") + (w - 1) <= F.col("n_grams"))
        .select("doc_id", "n_grams", "mh")
        .distinct()
    )


def _winnow_grams(d: DataFrame) -> DataFrame:
    """The winnowing GRAM frame ``(doc_id, n_grams, i, h)`` — one
    trigram explode + md5 per document, the w-independent prefix of
    the selection arithmetic (shared by the per-w selection and the
    single-pass w-curve)."""
    from tropology_spark.operators.pipeline_ops import word_ngrams

    return d.select(
        "doc_id",
        F.posexplode(word_ngrams(F.split(F.col("text"), " "), 3)).alias(
            "pos0", "gram"
        ),
        (F.size(F.split(F.col("text"), " ")) - 2).alias("n_grams"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("i"),
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )


_WINNOW_SEL_CACHE: dict[tuple[str, str], "DataFrame"] = {}

from tropology_spark.sources.tables import SESSION_CACHES  # noqa: E402

SESSION_CACHES.append(_WINNOW_SEL_CACHE)


def winnowing_sel_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered-w (=4) winnowing selection over the corpus
    documents, eagerly materialized once per (session, sf_dir) —
    shared by the M259 rollup and the M353 MOSS pair join (round-19:
    each used to re-run the explode + md5 + window-min pass).  Probe
    (``docs=``) and curve (``w=``) callers keep calling
    :func:`winnowing_selected` directly."""
    from tropology_spark.sources.tables import cache_get_or_build

    def build() -> DataFrame:
        return iter_materialize(winnowing_selected(spark, sf_dir))

    return cache_get_or_build(
        _WINNOW_SEL_CACHE, (spark.sparkContext.applicationId, sf_dir), build
    )


#: The winnowing selection CTE prefix (gram hashes -> window minima
#: -> DISTINCT selected fingerprints) -- the SQL single home mirrored
#: by the ``winnowing_selected`` Spark helper; spliced by the
#: registered M259 rollup and the staged MOSS pair join (r19 slate).
_WINNOW_SEL_CTE = f"""
    WITH g AS (
      SELECT doc_id, i,
             ('0x' || substring(md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]),
                                1, 8))::BIGINT AS h,
             len(l) - 2 AS n_grams
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 2
    ),
    wm AS (
      SELECT doc_id, n_grams, i,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS mh
      FROM g
    ),
    sel AS (SELECT DISTINCT doc_id, n_grams, mh
            FROM wm WHERE i + {_WIN_W - 1} <= n_grams)"""


@register(
    "text_winnowing_fingerprints",
    oracle=_WINNOW_SEL_CTE
    + """
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST((1000000 * count(*)) // n_grams AS BIGINT) AS density_ppm
    FROM sel GROUP BY doc_id, n_grams
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M259 — WINNOWING fingerprint selection (the MOSS
    algorithm): per document, the distinct trigram hashes that are the
    minimum of some 4-wide sliding window over the hash sequence —
    the local-sampling guarantee that any shared run of ≥ k+w−1 tokens
    between two documents shares at least one SELECTED fingerprint, at
    ~2/(w+1) storage of the full shingle set.  M6's rolling-hash
    fingerprint samples globally (mod-p); winnowing samples LOCALLY,
    which is what makes it the plagiarism/overlap detector of record.
    Emitted per doc: gram count, selected count, selection density ppm
    (docs shorter than k+w−1 tokens have no full window and are
    absent — both engines agree by construction).

    Scale: one shingle explode; the window min runs per-document
    (real partition key) over a frame of 4 rows; the DISTINCT
    collapse and rollup are map-side combinable.  The window-min
    MUST be computed before the full-window filter (filtering first
    would remove the tail rows from the frame — the staging lesson
    pinned in the oracle's subquery order).  Round-19: the selection
    comes from the session-shared winnowing_sel_materialized view
    (also the M353 base), not a private pass."""
    sel = winnowing_sel_materialized(spark, sf_dir)
    return sel.groupBy("doc_id", "n_grams").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.expr("(1000000 * count(1)) div n_grams")
        .cast("bigint")
        .alias("density_ppm"),
    ).select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "n_selected",
        "density_ppm",
    )


# ---------------------------------------------------------------------------
# M268 text_simpson_concentration — exact-integer lexical concentration
# ---------------------------------------------------------------------------


@register(
    "text_simpson_concentration",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
          FROM tok WHERE token <> '' GROUP BY doc_id, token),
    per AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS s2
            FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, s2,
           CAST(CASE WHEN n_tokens >= 2
                     THEN (1000000 * s2) // (n_tokens * (n_tokens - 1))
                     ELSE 0 END AS BIGINT) AS simpson_ppm
    FROM per
    """,
)
def text_simpson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M268 — per-document Simpson concentration (unbiased
    token collision probability sum c_i(c_i-1) / N(N-1), in ppm): the
    exact-integer lexical-diversity quality signal.  Complements M5
    (plain token counts) and M28 (bigram repetition): Simpson reacts
    to a skewed unigram DISTRIBUTION (one token dominating) that both
    of those miss — the classic low-quality signature of keyword-spam
    and template pages — and 1/Simpson is the effective vocabulary
    size filter pipelines threshold on.

    The unbiased (sampling-without-replacement) form keeps the whole
    statistic in BIGINT: numerator and denominator are integer
    products, one ppm-scaled integral division at the end (DuckDB //
    and Spark div agree — both operands non-negative).  The s2 carrier
    is emitted so downstream can re-derive any rescaling exactly.

    Scale: tokenize -> per-(doc,token) count (map-side combinable) ->
    per-doc rollup; two shuffles on doc-keyed rows, no joins, no
    windows — embarrassingly parallel over documents."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    c = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    per = c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("s2"),
    )
    return per.select(
        "doc_id", "n_tokens", "n_distinct", "s2",
        F.expr(
            "CAST(CASE WHEN n_tokens >= 2 THEN (1000000 * s2)"
            " div (n_tokens * (n_tokens - 1)) ELSE 0 END AS BIGINT)"
        ).alias("simpson_ppm"),
    )


# ---------------------------------------------------------------------------
# M272 text_bm25_terms — BM25 tf-component scoring, integer rational carriers
# ---------------------------------------------------------------------------

# BM25 with k1 = 1.2, b = 0.75: tf_comp = tf·(k1+1) / (tf + k1·(1−b)
# + k1·b·dl/avgdl).  Multiplying numerator and denominator by 10·D
# (D = Σdl, avgdl = D/N) clears every fraction:
#   milli = 22000·tf·D  //  (10·tf·D + 3·D + 9·dl·N)
# All terms non-negative BIGINTs (22000·tf·D stays < 2^63 up to
# tf·D ≈ 4·10¹⁴ — a ~10¹²-token corpus; docstring bound).
_BM25_ORACLE = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM tok GROUP BY doc_id),
    df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY token),
    g AS (SELECT CAST(sum(dl) AS BIGINT) AS d_total,
                 CAST(count(*) AS BIGINT) AS n_docs FROM dl),
    terms AS (SELECT token, df FROM (
        SELECT token, df,
               row_number() OVER (ORDER BY df DESC, token) AS rk_t
        FROM df) t WHERE rk_t <= 5),
    sc AS (SELECT t.token, f.doc_id, f.tf, l.dl, t.df,
                  CAST((22000 * f.tf * g.d_total)
                       // (10 * f.tf * g.d_total + 3 * g.d_total
                           + 9 * l.dl * g.n_docs) AS BIGINT) AS milli_tf_comp,
                  g.n_docs
           FROM terms t
           JOIN tf f ON f.token = t.token
           JOIN dl l ON l.doc_id = f.doc_id
           CROSS JOIN g)
    SELECT token, doc_id, tf, dl, df, n_docs, milli_tf_comp,
           CAST(rk_d AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY token
                                       ORDER BY milli_tf_comp DESC, doc_id)
                      AS rk_d
          FROM sc) r
    WHERE rk_d <= 10
"""


@register("text_bm25_terms", oracle=_BM25_ORACLE)
def text_bm25_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M272 — BM25 retrieval scoring for the five highest-df corpus
    terms: per (term, doc) the exact tf-saturation component
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) at the standard k1=1.2,
    b=0.75, carried as the integer rational
    milli = 22000·tf·D div (10·tf·D + 3·D + 9·dl·N) — multiplying
    through by 10·D clears every fraction, all terms are non-negative
    BIGINTs, and div//floor agree.  The idf factor is transcendental
    (ln), so per the *_terms discipline its exact integer inputs
    (n_docs, df) ride along as columns; top-10 docs per term by
    (milli DESC, doc_id).  Safe to ~10¹² corpus tokens
    (22000·tf·D < 2⁶³); beyond that the wide-integer rule applies.

    Scale: tf/dl/df are three map-side-combinable aggs over one
    tokenize pass; the corpus totals are a 1-row scalar attach
    (deliberate crossJoin, BNLJ-allowlisted); the per-term ranking
    window is partitioned by token — no global window.  At 100 TB the
    df/dl tables ARE the inverted-index statistics a retrieval system
    persists."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    df = tok.groupBy("token").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    g = dl.agg(
        F.sum("dl").cast("bigint").alias("d_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    terms = df.orderBy(F.desc("df"), F.asc("token")).limit(5)
    sc = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select(
            "token",
            "doc_id",
            "tf",
            "dl",
            "df",
            "n_docs",
            F.expr(
                "CAST((22000 * tf * d_total) div (10 * tf * d_total"
                " + 3 * d_total + 9 * dl * n_docs) AS BIGINT)"
            ).alias("milli_tf_comp"),
        )
    )
    w = Window.partitionBy("token").orderBy(
        F.desc("milli_tf_comp"), F.asc("doc_id")
    )
    return (
        sc.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select(
            "token", "doc_id", "tf", "dl", "df", "n_docs", "milli_tf_comp", "rk"
        )
    )


# ---------------------------------------------------------------------------
# text_heaps_curve — Heaps'-law vocabulary growth at corpus prefixes (M283)
# ---------------------------------------------------------------------------

_HEAPS_PCTS = (25, 50, 100)


@register(
    "text_heaps_curve",
    oracle=f"""
    WITH dmax AS (SELECT CAST(max(doc_id) AS BIGINT) AS dm FROM documents),
    pcts AS (SELECT unnest([{", ".join(str(p) for p in _HEAPS_PCTS)}]) AS pct),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents),
    t AS (SELECT doc_id, token FROM tok WHERE token <> '')
    SELECT CAST(pcts.pct AS BIGINT) AS pct,
           CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT t.token) AS BIGINT) AS n_vocab,
           CAST((1000000 * count(DISTINCT t.token)) // count(*) AS BIGINT)
             AS vocab_per_mtoken
    FROM pcts CROSS JOIN dmax
    JOIN t ON t.doc_id <= (pcts.pct * dmax.dm) // 100
    GROUP BY pcts.pct
    """,
)
def text_heaps_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """M283 — HEAPS'-LAW vocabulary growth: total tokens,
    distinct vocabulary and vocab-per-million-tokens at the 25% / 50%
    / 100% corpus prefixes (by doc_id order — the ingestion axis).
    V(n) ~ K·n^beta with beta < 1 is the sublinear law every tokenizer
    vocab budget and every dedup-capacity plan starts from; the curve
    makes the exponent VISIBLE as exact integers (the density column
    falling with the prefix is the sublinearity), with no
    transcendental fit inside the hash gate — the *_terms discipline.

    Scale: one tokenize pass; the bounded ×3 prefix explode rides the
    token rows with a filter (never three corpus scans); the prefix
    cut is data-derived (max doc_id via a pmod-constant-key window —
    regeneration-robust, no literal ids).  The distinct-vocab rollup
    is the one real shuffle, keyed by (pct, token).

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.pmod(F.col("doc_id"), F.lit(1)))
    base = d.select(
        "doc_id",
        "text",
        F.max("doc_id").over(w).cast("bigint").alias("dm"),
    )
    pcts = F.explode(
        F.array(*[F.lit(p) for p in _HEAPS_PCTS])
    ).alias("pct")
    t = (
        base.select("doc_id", "text", "dm", pcts)
        .filter(F.col("doc_id") <= F.expr("(pct * dm) div 100"))
        .select(
            "pct", "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    return (
        t.groupBy("pct")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("token").cast("bigint").alias("n_vocab"),
        )
        .select(
            F.col("pct").cast("bigint").alias("pct"),
            "n_docs",
            "n_tokens",
            "n_vocab",
            F.expr("(1000000 * n_vocab) div n_tokens")
            .cast("bigint")
            .alias("vocab_per_mtoken"),
        )
    )


# ---------------------------------------------------------------------------
# text_burstiness_terms — per-token Fano-factor terms on the daily axis
# ---------------------------------------------------------------------------

_BURST_TOPK = 30


@register(
    "text_burstiness_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 29 AS day, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    t AS (SELECT day, token FROM tok WHERE token <> ''),
    tot AS (SELECT token, CAST(count(*) AS BIGINT) AS total
            FROM t GROUP BY token),
    top AS (SELECT token, total FROM (
              SELECT token, total,
                     row_number() OVER (ORDER BY total DESC, token) AS rk
              FROM tot) x WHERE rk <= {_BURST_TOPK}),
    dc AS (SELECT t.token, t.day, CAST(count(*) AS BIGINT) AS c
           FROM t JOIN top ON t.token = top.token
           GROUP BY t.token, t.day),
    terms AS (
      SELECT token,
             CAST(count(*) AS BIGINT) AS n_active_days,
             CAST(sum(c) AS BIGINT) AS sum_c,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM dc GROUP BY token
    )
    SELECT terms.token, top.total, terms.n_active_days,
           terms.sum_c2,
           CAST(29 * terms.sum_c2 - top.total * top.total AS BIGINT)
             AS var_num_x29
    FROM terms JOIN top ON terms.token = top.token
    """,
)
def text_burstiness_terms(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """M298 — token BURSTINESS terms: for the corpus' top-{k}
    tokens, the exact inputs of the Fano factor (variance-to-mean of
    per-day counts over the FULL 29-day axis, zero-filled days
    included): total count, active-day count, Σc² and the assembled
    population-variance numerator 29·Σc² − total² (σ²·29² = that; the
    day axis is the deterministic doc_id % 29 spread — documents carry
    no timestamp, so the fixture's ingestion-day proxy is the id
    residue, the M26-style deterministic assignment).  A bursty token
    (template spam, event-driven vocab) has var ≫ mean; a uniform
    token has var ≈ mean — the signal a drift monitor thresholds,
    emitted as integers (*_terms discipline; absent days contribute
    exactly via the algebra — no domain-completion join, the
    mm_payload_uniformity trick on the time axis).

    Scale: tokenize once; the top-k cut bounds everything downstream
    (the per-(token, day) rollup joins a {k}-row broadcast); the rank
    rides a pmod-constant-key window over the bounded token-total
    axis.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    t = d.select(
        (F.col("doc_id") % 29).alias("day"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tot = t.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    # the 30-row top-k frame feeds TWO plan branches (the broadcast
    # into the per-(token, day) rollup and the final join) — the
    # DOUBLE-REFERENCE rule: pin it or the tokenize+aggregate+sort
    # subplan re-derives per reference (ADVICE r14).
    top = iter_materialize(
        tot.orderBy(F.desc("total"), F.asc("token")).limit(_BURST_TOPK)
    )
    dc = (
        t.join(F.broadcast(top.select("token")), "token")
        .groupBy("token", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    terms = dc.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_days"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    return terms.join(F.broadcast(top), "token").select(
        "token",
        "total",
        "n_active_days",
        "sum_c2",
        (29 * F.col("sum_c2") - F.col("total") * F.col("total"))
        .cast("bigint")
        .alias("var_num_x29"),
    )


# ---------------------------------------------------------------------------
# text_continuation_terms — Kneser-Ney continuation-count inputs
# ---------------------------------------------------------------------------

_CONT_TOP = 20

_CONT_ORACLE = f"""
    WITH pr AS (
      SELECT l[i] AS tok, l[i + 1] AS nxt
      FROM (SELECT string_split(text, ' ') AS l FROM documents),
           (SELECT unnest(generate_series(1, 4096)) AS i)
      WHERE i <= len(l) - 1
    ),
    bc AS (SELECT tok, nxt, CAST(count(*) AS BIGINT) AS c
           FROM pr GROUP BY tok, nxt),
    agg AS (SELECT tok,
                   CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(count(*) AS BIGINT) AS n_continuations,
                   CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num
            FROM bc GROUP BY tok),
    top AS (SELECT *, row_number() OVER (ORDER BY n_bigrams DESC, tok)
                        AS rk_c
            FROM agg)
    SELECT tok AS token, n_bigrams, n_continuations, simpson_num,
           CAST(rk_c AS BIGINT) AS rk
    FROM top WHERE rk_c <= {_CONT_TOP}
"""


@register("text_continuation_terms", oracle=_CONT_ORACLE)
def text_continuation_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M303 — Kneser-Ney continuation-count inputs for the {t} most frequent
    bigram left-contexts: per token, total bigram occurrences Σc,
    distinct continuations (the KN continuation count — how many
    DIFFERENT words follow), and the continuation concentration
    Σc(c−1) (the Simpson numerator over the follower distribution;
    with Σc it yields the repeat-follower probability).  These are
    exactly the integer statistics a backoff language model — and a
    data-quality pipeline judging formulaic text — derives smoothing
    weights from: high Σc with low continuations = boilerplate
    contexts.  The *_terms discipline: the KN discount ratio is a
    float, so its exact integer inputs ship instead.

    Pair generation is the J6 zip_with-slice idiom (scan-local, no
    position explode on the Spark side; the oracle enumerates
    positions with the standard 4096 cap).  Scale: one tokenize pass,
    two map-side-combinable aggs on (tok, nxt) then (tok); the top-{t}
    cut ranks an already-aggregated vocabulary table."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(F.split(F.col("text"), " ").alias("t"))
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size(F.col("t")) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("tok"), y.alias("nxt")),
    )
    pr = toked.select(F.explode(pairs).alias("p")).select("p.tok", "p.nxt")
    bc = pr.groupBy("tok", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = bc.groupBy("tok").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_continuations"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("simpson_num"),
    )
    top = agg.orderBy(F.desc("n_bigrams"), F.asc("tok")).limit(_CONT_TOP)
    w = Window.partitionBy(F.pmod(F.length("tok"), F.lit(1))).orderBy(
        F.desc("n_bigrams"), F.asc("tok")
    )
    return top.select(
        F.col("tok").alias("token"),
        "n_bigrams",
        "n_continuations",
        "simpson_num",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


text_continuation_terms.__doc__ = text_continuation_terms.__doc__.format(
    t=_CONT_TOP
)


# ---------------------------------------------------------------------------
# text_winnowing_w_curve — selection density vs winnowing window size
# ---------------------------------------------------------------------------

_WIN_WS = (2, 4, 8)


def _winnow_curve_oracle() -> str:
    parts = []
    for w in _WIN_WS:
        parts.append(
            f"""
    SELECT CAST({w} AS BIGINT) AS w,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_sel) AS BIGINT) AS n_selected,
           CAST((1000000 * sum(n_sel)) // sum(n_grams) AS BIGINT)
             AS density_ppm
    FROM (
      SELECT doc_id, any_value(n_grams) AS n_grams,
             CAST(count(*) AS BIGINT) AS n_sel
      FROM (
        SELECT DISTINCT doc_id, n_grams, mh FROM (
          SELECT doc_id, n_grams, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS mh
          FROM (
            SELECT doc_id, i,
                   ('0x' || substring(md5(l[i] || ' ' || l[i+1] || ' '
                                          || l[i+2]), 1, 8))::BIGINT AS h,
                   len(l) - 2 AS n_grams
            FROM (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents),
                 (SELECT unnest(generate_series(1, 4096)) AS i)
            WHERE i <= len(l) - 2
          ) g
        ) wm WHERE i + {w - 1} <= n_grams
      ) sel GROUP BY doc_id
    ) per
    """
        )
    return " UNION ALL ".join(parts)


@register("text_winnowing_w_curve", oracle=_winnow_curve_oracle())
def text_winnowing_w_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M312 — Winnowing selection DENSITY vs window size w ∈ {2, 4, 8}
    — the fingerprint-budget tuning axis (MOSS's guarantee threshold
    t = w + k − 1 grows with w while expected density falls as
    2/(w+1): this curve measures the actual storage/guarantee trade
    on the corpus, next to M259's fixed-4 production rule).

    Round-19 optimization (guide §1.3 — do the expensive thing once):
    ONE gram pass serves all three points.  The explode + md5 + the
    per-doc sort are w-independent; the three window minima are three
    ``min OVER (rowsBetween(0, w-1))`` columns over the SAME window
    partition/order, so Spark computes them in one WindowExec over
    one sort (before: ×|ws| full explode+hash+sort passes).  Each
    point's selection then filters/distincts its own column —
    per-value arithmetic identical to :func:`winnowing_selected` at
    that w (the twin + the nesting property suite pin the values:
    Selected(8) ⊆ Selected(4) ⊆ Selected(2), density monotone).
    Corpus rollup per w: covered docs, their gram total, selected
    fingerprints, density ppm.  Scale: one pass (per-doc windows, no
    global window); the curve is 3 rows."""
    g = _winnow_grams(load(spark, sf_dir, "documents"))
    wm = iter_materialize(
        g.select(
            "doc_id",
            "n_grams",
            "i",
            *[
                F.min("h")
                .over(
                    Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
                )
                .alias(f"mh{w}")
                for w in _WIN_WS
            ],
        )
    )  # one frame, three curve-point branches — DOUBLE-REFERENCE RULE
    out = None
    for w in _WIN_WS:
        sel = (
            wm.filter(F.col("i") + (w - 1) <= F.col("n_grams"))
            .select("doc_id", "n_grams", F.col(f"mh{w}").alias("mh"))
            .distinct()
        )
        per = sel.groupBy("doc_id").agg(
            F.first("n_grams").alias("n_grams"),
            F.count(F.lit(1)).cast("bigint").alias("n_sel"),
        )
        row = per.agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("total_grams"),
            F.sum("n_sel").cast("bigint").alias("n_selected"),
        ).select(
            F.lit(w).cast("bigint").alias("w"),
            "n_docs",
            "total_grams",
            "n_selected",
            F.expr(
                "CAST((1000000 * n_selected) div total_grams AS BIGINT)"
            ).alias("density_ppm"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# text_zipf_rank_curve — rank x frequency Zipf product for the top-20 tokens
# ---------------------------------------------------------------------------

_ZIPF_TOP = 20


@register(
    "text_zipf_rank_curve",
    oracle=f"""
    WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token
                FROM documents),
    vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
              FROM tk GROUP BY token),
    rk AS (SELECT token, freq,
                  row_number() OVER (ORDER BY freq DESC, token) AS rk17
           FROM vocab),
    top AS (SELECT * FROM rk WHERE rk17 <= {_ZIPF_TOP}),
    t AS (
      SELECT CAST(rk17 AS BIGINT) AS rank, token, freq,
             CAST(max(CASE WHEN rk17 = 1 THEN freq END) OVER () AS BIGINT)
               AS top_freq
      FROM top
    )
    SELECT rank, token, freq, top_freq,
           CAST((1000000 * freq * rank) // top_freq AS BIGINT)
             AS zipf_ratio_ppm,
           CAST((1000000 * freq * rank) // top_freq - 1000000 AS BIGINT)
             AS dev_ppm
    FROM t
    """,
)
def text_zipf_rank_curve(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """M329 — the ZIPF rank-frequency product for the top-20 tokens:
    under Zipf's law with s=1, rank × frequency is constant, so the
    exact integer carrier 10⁶·c_r·r/c_1 sits near 10⁶ for a
    natural-language corpus and drifts for synthetic or boilerplate
    text — the corpus-naturalness screen that needs NO logarithms
    (the log-log regression's transcendentals never enter the hash
    gate).  dev_ppm is the signed per-rank deviation — the fitted
    residual a quality monitor tracks release-over-release.

    Ranking: the vocabulary is tiny next to the corpus (M164's
    argument), so its global (freq DESC, token) rank rides the
    pmod-constant-key window over the vocab frame — no corpus sort,
    no partition-less window over data-scale rows.  Scale: one token
    rollup (map-side combinable), one O(vocab) window, a 20-row tail.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    tk = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    rk = vocab.withColumn(
        "rk17",
        F.row_number().over(
            Window.partitionBy(F.pmod(F.col("freq"), F.lit(1))).orderBy(
                F.col("freq").desc(), F.col("token")
            )
        ),
    ).filter(F.col("rk17") <= _ZIPF_TOP)
    w = Window.partitionBy(F.pmod(F.col("rk17"), F.lit(1)))
    t = rk.select(
        F.col("rk17").cast("bigint").alias("rank"),
        "token",
        "freq",
        F.max(F.when(F.col("rk17") == 1, F.col("freq")))
        .over(w)
        .cast("bigint")
        .alias("top_freq"),
    )
    return t.select(
        "rank",
        "token",
        "freq",
        "top_freq",
        F.expr("(1000000 * freq * rank) div top_freq")
        .cast("bigint")
        .alias("zipf_ratio_ppm"),
        (F.expr("(1000000 * freq * rank) div top_freq") - F.lit(1_000_000))
        .cast("bigint")
        .alias("dev_ppm"),
    )


# ---------------------------------------------------------------------------
# M340 text_source_tv_matrix — pairwise total-variation drift matrix
# ---------------------------------------------------------------------------


@register(
    "text_source_tv_matrix",
    oracle="""
    WITH per AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    srcs AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM per
             GROUP BY source),
    vocab AS (SELECT DISTINCT token FROM per),
    z AS (
      SELECT srcs.source, srcs.nt, vocab.token, coalesce(per.n, 0) AS c
      FROM srcs CROSS JOIN vocab
      LEFT JOIN per ON per.source = srcs.source AND per.token = vocab.token
    ),
    pair AS (
      SELECT a.source AS src_a, b.source AS src_b,
             any_value(a.nt) AS na, any_value(b.nt) AS nb,
             sum(abs(CAST(a.c AS HUGEINT) * b.nt
                     - CAST(b.c AS HUGEINT) * a.nt)) AS sad
      FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, CAST(na AS BIGINT) AS n_tokens_a,
           CAST(nb AS BIGINT) AS n_tokens_b,
           CAST((1000000 * sad) // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT)
             AS tv_ppm
    FROM pair
    """,
)
def text_source_tv_matrix(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """M340 — the pairwise TOTAL-VARIATION drift matrix: for
    every source pair, TV(p, q) = ½·Σ_tokens |p_t − q_t| over the
    unigram distributions, as the exact rational
    (10⁶·Σ|c_a·N_b − c_b·N_a|) div (2·N_a·N_b) — the
    distribution-distance every ingest monitor wants between corpus
    slices, with no logarithms (KL/JS are transcendental; TV is the
    exact member of the divergence family, and bounds JS via
    Pinsker's cousin).  M94 ranks over-represented tokens WITHIN a
    source; this compares sources TO EACH OTHER — the numbers that
    say which ingest streams are interchangeable.

    The zero-filled (source × vocab) long frame feeds both pair sides
    — DOUBLE-REFERENCE RULE.  Scale: the corpus collapses to the
    (source, token) counts once; the pair stage is bounded by
    |sources|² · |vocab| — source counts are curated-small, and a
    100 TB deployment caps the vocab axis exactly like the 4096
    oracle-enumeration discipline caps positions.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    d = docs if docs is not None else load(spark, sf_dir, "documents")
    per = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    srcs = per.groupBy("source").agg(F.sum("n").cast("bigint").alias("nt"))
    vocab = per.select("token").distinct()
    z = iter_materialize(  # both pair sides — DOUBLE-REFERENCE RULE
        srcs.crossJoin(vocab)
        .join(per, ["source", "token"], "left")
        .select(
            "source", "nt", "token", F.coalesce(F.col("n"), F.lit(0)).alias("c")
        )
    )
    a = z.select(
        F.col("source").alias("src_a"),
        F.col("nt").alias("na"),
        "token",
        F.col("c").alias("ca"),
    )
    b = z.select(
        F.col("source").alias("src_b"),
        F.col("nt").alias("nb"),
        F.col("token").alias("tb"),
        F.col("c").alias("cb"),
    )
    pair = (
        a.join(b, (F.col("token") == F.col("tb")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.sum(
                F.abs(
                    F.expr("CAST(ca AS DECIMAL(38,0)) * nb")
                    - F.expr("CAST(cb AS DECIMAL(38,0)) * na")
                )
            ).alias("sad"),
        )
    )
    return pair.select(
        "src_a",
        "src_b",
        F.col("na").cast("bigint").alias("n_tokens_a"),
        F.col("nb").cast("bigint").alias("n_tokens_b"),
        F.expr(
            "CAST((1000000 * sad) div (2 * CAST(na AS DECIMAL(38,0)) * nb)"
            " AS BIGINT)"
        ).alias("tv_ppm"),
    )


# ---------------------------------------------------------------------------
# M353 dedup_moss_pairs — winnowing-fingerprint pair detection (MOSS)
#
# PLACEMENT EXCEPTION (the graph_reach2_hll_audit rule): this dedup-family
# op registers in text.py, NOT dedup.py — its oracle builder splices
# ``_WINNOW_SEL_CTE`` at import time, and dedup.py imports BEFORE text.py
# in the package init, so a dedup-level import of text would run text's
# registrations mid-package-init and silently reorder the registry.
# ---------------------------------------------------------------------------

_MOSS_MIN_SHARED = 2


def _moss_oracle() -> str:
    return (
        _WINNOW_SEL_CTE
        + f""",
    ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sel
           FROM sel GROUP BY doc_id),
    pr AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sel a JOIN sel b ON a.mh = b.mh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= {_MOSS_MIN_SHARED}
    )
    SELECT pr.doc_a, pr.doc_b, pr.n_shared,
           na.n_sel AS n_sel_a, nb.n_sel AS n_sel_b,
           CAST((1000000 * pr.n_shared) // least(na.n_sel, nb.n_sel)
                AS BIGINT) AS cont_ppm
    FROM pr JOIN ns na ON na.doc_id = pr.doc_a
            JOIN ns nb ON nb.doc_id = pr.doc_b
    """
    )


@register("dedup_moss_pairs", oracle=_moss_oracle())
def dedup_moss_pairs(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """SURVEY §2.M M353 — MOSS itself: document pairs sharing ≥ 2
    winnowing fingerprints, with the shared count and containment ppm
    (shared / the smaller selected set) — the plagiarism/overlap
    detector of record, now as the PAIR stage on top of M259's
    selection (M259 measures selection density per doc; M125 measures
    span fraction per doc; this is the cross-document join the
    winnowing guarantee exists FOR: any shared run of ≥ k+w−1 tokens
    shares a selected fingerprint, so true overlaps cannot be
    missed).

    Composed, not copied: the Spark side reuses ``winnowing_selected``
    (checkpointed once — it feeds both join sides AND the per-doc
    size rollup); the oracle splices the factored ``_WINNOW_SEL_CTE``
    (verified byte-identical to the registered M259 prefix at the
    factoring commit).  Scale: candidates meet on the shared
    fingerprint key — the LSH band-join economics, never all-pairs;
    the ≥ 2 gate prunes singleton-hash coincidences.

    ``docs=`` substitutes the document frame for probes; the driver
    contract never passes it."""
    sel = (
        winnowing_sel_materialized(spark, sf_dir)
        if docs is None
        else iter_materialize(winnowing_selected(spark, sf_dir, docs=docs))
    )
    ns = sel.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sel"))
    a = sel.select(F.col("doc_id").alias("doc_a"), "mh")
    b = sel.select(F.col("doc_id").alias("doc_b"), F.col("mh").alias("mhb"))
    pr = (
        a.join(b, (F.col("mh") == F.col("mhb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _MOSS_MIN_SHARED)
    )
    na = ns.select(F.col("doc_id").alias("doc_a"), F.col("n_sel").alias("n_sel_a"))
    nb = ns.select(F.col("doc_id").alias("doc_b"), F.col("n_sel").alias("n_sel_b"))
    return (
        pr.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_sel_a",
            "n_sel_b",
            F.expr("(1000000 * n_shared) div least(n_sel_a, n_sel_b)")
            .cast("bigint")
            .alias("cont_ppm"),
        )
    )
