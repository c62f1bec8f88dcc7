"""Corpus-preparation pipeline queries (beyond-reference mandate, SURVEY
§7.1 north star): normalization, PII redaction, Gopher-style quality
filtering, repetition statistics, deterministic stratified sampling,
mixing weights, corpus vocabulary, incremental dedup.

Every query has an exact DuckDB oracle: all transforms are deterministic
JVM expressions (regex/array/hash arithmetic) shared verbatim with the
SQL, and all ratios divide the same integer operands so the IEEE doubles
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.llm import pipeline as P
from flink_spark.queries import annsql as ANN
from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table

# Sampling plan for the stratified-sample query (rate per source stratum,
# buckets of 1000) — shared with the oracle CASE expression.
SAMPLE_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
SAMPLE_DEFAULT = 0.1

_HASH_SQL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000"

_RATE_CASE_SQL = (
    "CASE source "
    + " ".join(
        f"WHEN '{k}' THEN {int(round(v * 1000))}"
        for k, v in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE {int(round(SAMPLE_DEFAULT * 1000))} END"
)


@query(
    "pipe_normalize",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(lower(trim(text)), '[^\w\s]', '', 'g'),
                          '\s+', ' ', 'g') AS text_norm
    FROM documents
    """,
)
def pipe_normalize(spark, sf_dir):
    """Canonical normalization: trim → lower → strip punctuation → collapse
    whitespace. One codegen'd expression chain, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", P.normalize_text("text").alias("text_norm"))


@query(
    "pipe_pii_redact",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS text_redacted,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
           len(regexp_extract_all(text,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn
    FROM documents
    """,
)
def pipe_pii_redact(spark, sf_dir):
    """PII scrub: typed placeholder redaction + per-category match counts
    (email/phone/IPv4/SSN), all regexp expressions (linear scan).

    Note: the redaction order is email→phone→ipv4→ssn, replicated in the
    oracle's nesting, so overlapping matches resolve identically."""
    docs = load_table(spark, sf_dir, "documents")
    out = P.pii_redact(docs)
    return out.select(
        "doc_id", "text_redacted", "n_email", "n_phone", "n_ipv4", "n_ssn"
    )


@query(
    "pipe_quality_filter",
    oracle=rf"""
    WITH t AS (SELECT doc_id, text,
                      string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    m AS (SELECT doc_id, text, len(toks) AS n_words,
                 (length(text) - len(toks) + 1) / len(toks) AS mean_wl,
                 length(text) - length(regexp_replace(text, '[#@\.\*]', '', 'g'))
                   AS n_sym,
                 len(list_intersect(list_distinct(toks),
                     ['the','and','of','to','a'])) AS n_stop
          FROM t)
    SELECT doc_id,
           n_words >= {P.GOPHER_MIN_WORDS} AND n_words <= {P.GOPHER_MAX_WORDS}
             AS ok_word_count,
           mean_wl >= {P.GOPHER_MEAN_WORD_LEN_MIN}
             AND mean_wl <= {P.GOPHER_MEAN_WORD_LEN_MAX} AS ok_mean_word_len,
           n_sym / length(text) <= {P.GOPHER_MAX_SYMBOL_RATIO} AS ok_symbol_ratio,
           n_stop >= {P.GOPHER_MIN_STOPWORD_TYPES} AS ok_stopwords,
           (n_words >= {P.GOPHER_MIN_WORDS} AND n_words <= {P.GOPHER_MAX_WORDS})
             AND (mean_wl >= {P.GOPHER_MEAN_WORD_LEN_MIN}
                  AND mean_wl <= {P.GOPHER_MEAN_WORD_LEN_MAX})
             AND (n_sym / length(text) <= {P.GOPHER_MAX_SYMBOL_RATIO})
             AND (n_stop >= {P.GOPHER_MIN_STOPWORD_TYPES}) AS keep
    FROM m
    """,
)
def pipe_quality_filter(spark, sf_dir):
    """Gopher-rules quality filter: word-count band, mean-word-length band,
    symbol ratio, stopword presence → per-rule flags + keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    return P.gopher_quality_flags(docs).select(
        "doc_id", "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_stopwords", "keep",
    )


@query(
    "pipe_repetition_stats",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
          FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
          WHERE i <= len(ws) - 1),
    c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
           MAX(n) / SUM(n) AS top_bigram_frac,
           SUM(CASE WHEN n > 1 THEN n ELSE 0 END) / SUM(n) AS dup_bigram_frac
    FROM c GROUP BY doc_id
    """,
)
def pipe_repetition_stats(spark, sf_dir):
    """Gopher repetition signals: per-doc bigram total, top-bigram share,
    duplicated-bigram share (explode → two partial-aggregated groupBys)."""
    docs = load_table(spark, sf_dir, "documents")
    return P.repetition_stats(docs)


@query(
    "pipe_stratified_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_HASH_SQL} < {_RATE_CASE_SQL}
    """,
)
def pipe_stratified_sample(spark, sf_dir):
    """Deterministic hash-bucket stratified sampling by source — a pure
    filter (no shuffle, no rand()), reproducible at any parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    return P.stratified_sample(
        docs, SAMPLE_RATES, default_rate=SAMPLE_DEFAULT
    ).select("doc_id", "source")


@query(
    "pipe_source_mix",
    oracle=r"""
    WITH per AS (SELECT source, COUNT(*) AS n_docs,
                        CAST(SUM(len(string_split_regex(trim(text), '\s+')))
                          AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source)
    SELECT source, n_docs, n_tokens,
           n_tokens / SUM(n_tokens) OVER () AS token_share,
           (1.0 / COUNT(*) OVER ()) / (n_tokens / SUM(n_tokens) OVER ())
             AS uniform_weight
    FROM per
    """,
)
def pipe_source_mix(spark, sf_dir):
    """Data-mixing weights: per-source token share and the resampling
    weight that flattens the mix to uniform."""
    docs = load_table(spark, sf_dir, "documents")
    return P.source_mix_weights(docs)


@query(
    "pipe_vocab_top100",
    oracle=r"""
    WITH c AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
               FROM documents),
    n AS (SELECT token, COUNT(*) AS n FROM c GROUP BY token)
    SELECT token, n,
           ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
    FROM n ORDER BY n DESC, token LIMIT 100
    """,
)
def pipe_vocab_top100(spark, sf_dir):
    """Corpus vocabulary: two-phase word count (map-side partials → one
    token-keyed shuffle) → top-100 by (count desc, token)."""
    docs = load_table(spark, sf_dir, "documents")
    return P.vocab_topk(docs, k=100)


@query(
    "pipe_incremental_dedup",
    oracle=r"""
    WITH seen AS (SELECT DISTINCT
                    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                  FROM documents WHERE source = 'src0'),
    batch AS (SELECT doc_id,
                md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
              FROM documents WHERE source <> 'src0')
    SELECT doc_id, fp FROM batch
    WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.fp = batch.fp)
    """,
)
def pipe_incremental_dedup(spark, sf_dir):
    """Incremental dedup: anti-join an incoming batch (source<>'src0')
    against the already-ingested corpus's fingerprint set (source='src0');
    the seen side is a minimal (fp) projection AQE can broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    return P.incremental_dedup(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


@query(
    "pipe_sequence_pack",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      len(string_split_regex(trim(text), '\\s+')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS before
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(before // {P.SEQ_LEN} AS BIGINT) AS bin_id,
           CAST(before % {P.SEQ_LEN} AS BIGINT) AS bin_offset
    FROM c
    """,
)
def pipe_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing: per-source deterministic doc
    order, cut into fixed 256-token bins; each doc gets (bin, offset).
    One window per stratum — strata pack in parallel."""
    docs = load_table(spark, sf_dir, "documents")
    return P.sequence_pack(docs)


@query("pipe_kmeans_clusters", oracle=ANN.kmeans_assign_oracle())
def pipe_kmeans_clusters(spark, sf_dir):
    """Deterministic Lloyd's k-means (k=8, 5 iters) over the embeddings
    table — JVM argmin assignment + two-phase k×d mean update. EXACT
    oracle (r9): the fixed-iteration deterministic Lloyd's unrolls into
    DuckDB CTEs (queries/annsql.py); dist_sq folds in the same sequential
    order on both engines, so even the raw doubles hash-match.
    Invariants additionally pytest-checked in
    tests/test_pipeline.py::test_kmeans_assignment_consistent."""
    from flink_spark.llm.clustering import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(emb, k=8, n_iter=5)
    return assigned.select("vec_id", "cluster", "dist_sq")


@query(
    "pipe_decontaminate",
    oracle="""
    WITH w AS (SELECT doc_id, source, string_split(trim(text), ' ') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, source,
                  ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
           WHERE i <= len(ws) - 2),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src19')
    SELECT s.doc_id, COUNT(*) AS n_contaminated_shingles
    FROM sh s JOIN ev ON s.shingle = ev.shingle
    WHERE s.source <> 'src19'
    GROUP BY s.doc_id
    """,
)
def pipe_decontaminate(spark, sf_dir):
    """Benchmark decontamination: train docs (source<>'src19') flagged by
    distinct 3-gram overlap with the eval set (source='src19'); eval
    shingle set broadcast by AQE."""
    docs = load_table(spark, sf_dir, "documents")
    return P.decontaminate(
        docs.where(F.col("source") != "src19"),
        docs.where(F.col("source") == "src19"),
    )


@query("pipe_semantic_neardup", oracle=ANN.semantic_neardup_oracle())
def pipe_semantic_neardup(spark, sf_dir):
    """Semantic dedup (SemDeDup-style): k-means bucket then cosine-score
    within clusters only — the O(Σ|cluster|²) scale path for the exact
    O(n²) `llm_cosine_neardup_pairs`. EXACT oracle (r9): the
    fixed-iteration Lloyd's + multi-probe pair join unrolls into DuckDB
    CTEs (queries/annsql.py); recall vs the exact pair set additionally
    asserted in tests/test_pipeline.py."""
    from flink_spark.llm.clustering import semantic_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 250)
    return semantic_neardup_pairs(emb, k=8, n_iter=3, threshold=0.35)


@query(
    "pipe_sequence_pack_ranged",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      len(string_split_regex(trim(text), '\\s+')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                   AS before
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(before // {P.SEQ_LEN} AS BIGINT) AS bin_id,
           CAST(before % {P.SEQ_LEN} AS BIGINT) AS bin_offset
    FROM c
    """,
)
def pipe_sequence_pack_ranged(spark, sf_dir):
    """Range-bucketed two-pass sequence packing — same bins/offsets as
    pipe_sequence_pack (identical oracle) but the widest window partition
    is 1/n_buckets of a stratum, so a single giant stratum still packs in
    parallel: bucket token totals (distributed agg) → tiny seam prefix →
    local running sums."""
    docs = load_table(spark, sf_dir, "documents")
    return P.sequence_pack_ranged(docs, n_buckets=16)


@query(
    "pipe_passage_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws
               FROM documents),
    c AS (SELECT doc_id, i AS chunk_idx,
                 array_to_string(ws[(10*i + 1):(10*i + 10)], ' ') AS chunk
          FROM w, LATERAL (SELECT unnest(range(len(ws) // 10)) AS i) t),
    r AS (SELECT doc_id, chunk_idx,
                 ROW_NUMBER() OVER (PARTITION BY chunk
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM c)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS removed_chunks
    FROM r GROUP BY doc_id
    """,
)
def pipe_passage_dedup(spark, sf_dir):
    """Passage-level exact dedup (C4/RefinedWeb paragraph-dedup pass over
    fixed 10-word passages): identical passages keep only their first
    (doc, position) occurrence corpus-wide; per-doc kept/removed counts.
    One shuffle on the passage text, no pairwise comparisons."""
    docs = load_table(spark, sf_dir, "documents")
    return P.passage_dedup(docs)


@query(
    "pipe_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents),
    t2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    pairs AS (SELECT doc_id, w, COUNT(*) AS cnt FROM t2 GROUP BY doc_id, w),
    freq AS (SELECT w, SUM(cnt) AS c FROM pairs GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM freq)
    SELECT pairs.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(cnt * ROUND(LN(c / t), 9) AS DECIMAL(30,6)))
                AS DOUBLE) / SUM(cnt) AS avg_logprob
    FROM pairs JOIN freq USING (w), tot
    GROUP BY pairs.doc_id
    """,
)
def pipe_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality scoring (the CCNet/KenLM perplexity-filter
    signal, exact): per-document average token log-probability under the
    corpus's own unigram distribution — the standard 'prune gibberish and
    off-domain text' score for training-data curation. Two-phase counts,
    per-doc (token, cnt) collapse before the frequency join, all JVM
    (`flink_spark/llm/text.py` unigram_logprob)."""
    from flink_spark.llm.text import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"))


@query(
    "pipe_tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents),
    t2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t2 GROUP BY doc_id, w),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (
      SELECT doc_id, w, tf.tf, dfreq.df,
             ROUND(tf.tf * LN(n / dfreq.df), 9) AS tfidf
      FROM tf JOIN dfreq USING (w), nd)
    SELECT doc_id, w AS term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, w) AS rnk
      FROM scored) x
    WHERE rnk <= 3
    """,
)
def pipe_tfidf_top_terms(spark, sf_dir):
    """Per-document characteristic terms by tf-idf (keyword extraction /
    topic signature over the corpus): raw tf × ln(N/df), top-3 per doc.
    The per-doc top-k runs as a WindowGroupLimit after the two small
    token-keyed aggregates (`flink_spark/llm/text.py` tfidf_top_terms)."""
    from flink_spark.llm.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


@query(
    "pipe_url_dedup",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://' || source || '.example.com/doc/'
                           || CAST(doc_id % 120 AS VARCHAR)
               WHEN 1 THEN 'http://www.' || source || '.example.com/doc/'
                           || CAST(doc_id % 120 AS VARCHAR) || '/'
               WHEN 2 THEN 'HTTPS://' || upper(source)
                           || '.EXAMPLE.COM/doc/'
                           || CAST(doc_id % 120 AS VARCHAR) || '?utm=x'
               ELSE 'https://' || source || '.example.com/doc/'
                    || CAST(doc_id % 120 AS VARCHAR) || '#frag'
             END AS url
      FROM documents),
    c AS (SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   lower(url), '^https?://', ''), '^www\\.', ''),
                   '[?#].*$', ''), '/+$', '') AS canonical_url
          FROM u)
    SELECT canonical_url, MIN(doc_id) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM c GROUP BY canonical_url
    """,
)
def pipe_url_dedup(spark, sf_dir):
    """URL canonical dedup (the crawl-corpus pre-text dedup pass):
    deterministic URLs synthesized per doc in four noisy spellings of the
    same resource (scheme case, www, trailing slash, query/fragment) are
    canonicalized JVM-side and deduped on one hash shuffle — same-resource
    spellings collapse to one canonical key, keeping the smallest doc id
    (`flink_spark/llm/pipeline.py` url_canonical_dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 120).cast("string")
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example.com/doc/"), k))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("http://www."), F.col("source"),
                       F.lit(".example.com/doc/"), k, F.lit("/")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("HTTPS://"), F.upper(F.col("source")),
                       F.lit(".EXAMPLE.COM/doc/"), k, F.lit("?utm=x")))
        .otherwise(F.concat(F.lit("https://"), F.col("source"),
                            F.lit(".example.com/doc/"), k, F.lit("#frag")))
    )
    return P.url_canonical_dedup(docs.select("doc_id", url.alias("url")))


@query(
    "pipe_bigram_logprob",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    big AS (SELECT doc_id, ws[i] AS u, ws[i+1] AS v
            FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
            WHERE i <= len(ws) - 1 AND ws[i] <> '' AND ws[i+1] <> ''),
    pairs AS (SELECT doc_id, u, v, COUNT(*) AS cnt FROM big
              GROUP BY doc_id, u, v),
    model AS (SELECT u, v, SUM(cnt) AS cuv FROM pairs GROUP BY u, v),
    hist AS (SELECT u, SUM(cuv) AS cu FROM model GROUP BY u)
    SELECT pairs.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(cnt * ROUND(LN(cuv / cu), 9) AS DECIMAL(30,6)))
                AS DOUBLE) / SUM(cnt) AS avg_logprob
    FROM pairs JOIN model USING (u, v) JOIN hist USING (u)
    GROUP BY pairs.doc_id
    """,
)
def pipe_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality scoring (the KenLM n-gram perplexity filter, one
    order above pipe_unigram_logprob): per-document average bigram
    log-probability under the corpus's own bigram MLE with prefix-sum
    histories. Bigram extraction is a single JVM `transform` over the
    token array (no positional self-join); per-doc (u,v,cnt) collapse
    before the model join (`flink_spark/llm/text.py` bigram_logprob)."""
    from flink_spark.llm.text import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents"))


@query(
    "pipe_interp_logprob",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    big AS (SELECT doc_id, ws[i] AS u, ws[i+1] AS v
            FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
            WHERE i <= len(ws) - 1 AND ws[i] <> '' AND ws[i+1] <> ''),
    pairs AS (SELECT doc_id, u, v, COUNT(*) AS cnt FROM big
              GROUP BY doc_id, u, v),
    model AS (SELECT u, v, SUM(cnt) AS cuv FROM pairs GROUP BY u, v),
    hist AS (SELECT u, SUM(cuv) AS cu FROM model GROUP BY u),
    ufreq AS (SELECT v, SUM(cuv) AS cv FROM model GROUP BY v),
    tot AS (SELECT SUM(cv) AS t FROM ufreq)
    SELECT pairs.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(cnt * ROUND(LN(0.75 * (cuv / cu)
                                        + 0.25 * (cv / t)), 9)
                         AS DECIMAL(30,6))) AS DOUBLE) / SUM(cnt)
             AS avg_logprob
    FROM pairs JOIN model USING (u, v) JOIN hist USING (u)
               JOIN ufreq USING (v), tot
    GROUP BY pairs.doc_id
    """,
)
def pipe_interp_logprob(spark, sf_dir):
    """Jelinek-Mercer interpolated bigram/unigram scorer (λ=0.75) — the
    smoothing shape real perplexity filters use: rare continuations back
    off to the unigram floor instead of zeroing
    (`flink_spark/llm/text.py` interpolated_logprob)."""
    from flink_spark.llm.text import interpolated_logprob

    return interpolated_logprob(load_table(spark, sf_dir, "documents"), lam=0.75)


@query(
    "pipe_longsubstring_spans",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    p AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(ws[i:i+4], ' ')) AS gh
          FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
          WHERE i <= len(ws) - 4),
    rep AS (SELECT gh FROM p GROUP BY gh
            HAVING COUNT(DISTINCT doc_id) >= 2),
    m AS (SELECT doc_id, pos FROM p WHERE gh IN (SELECT gh FROM rep)),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN MAX(pos + 4) OVER
                          (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) IS NULL
                        OR pos > MAX(pos + 4) OVER
                          (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) + 1
                   THEN 1 ELSE 0 END AS ni
            FROM m),
    g AS (SELECT doc_id, pos,
                 SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
          FROM isl)
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS span_tokens
    FROM g GROUP BY doc_id, island
    """,
)
def pipe_longsubstring_spans(spark, sf_dir):
    """Cross-document repeated-substring spans (the ExactSubstr /
    suffix-array training-data dedup operator, rendered as k-gram
    position hashing): every 5-token substring occurring in ≥2 distinct
    documents marks its span; overlapping/adjacent spans merge per doc
    (gaps-and-islands). One explode pass + one hash shuffle + one
    semi-join + one per-doc window — no suffix array, no cross product
    (llm/dedup.py long_substring_spans)."""
    from flink_spark.llm.dedup import long_substring_spans

    docs = load_table(spark, sf_dir, "documents")
    out = long_substring_spans(docs, window=5)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
    )


@query(
    "pipe_longsubstring_filter",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
               FROM documents),
    p AS (SELECT doc_id, i AS pos,
                 md5(array_to_string(ws[i:i+4], ' ')) AS gh
          FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) t
          WHERE i <= len(ws) - 4),
    rep AS (SELECT gh FROM p GROUP BY gh
            HAVING COUNT(DISTINCT doc_id) >= 2),
    m AS (SELECT doc_id, pos FROM p WHERE gh IN (SELECT gh FROM rep)),
    isl AS (SELECT doc_id, pos,
                   CASE WHEN MAX(pos + 4) OVER
                          (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) IS NULL
                        OR pos > MAX(pos + 4) OVER
                          (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) + 1
                   THEN 1 ELSE 0 END AS ni
            FROM m),
    g AS (SELECT doc_id, pos,
                 SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
          FROM isl),
    spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e
              FROM g GROUP BY doc_id, island),
    dup AS (SELECT doc_id,
                   SUM(e - s + 1) AS dup_tokens FROM spans GROUP BY doc_id),
    tok AS (SELECT doc_id, len(ws) AS n_tokens FROM w)
    SELECT t.doc_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           (COALESCE(d.dup_tokens, 0) * 2 > t.n_tokens) AS drop_doc
    FROM tok t LEFT JOIN dup d ON t.doc_id = d.doc_id
    """,
)
def pipe_longsubstring_filter(spark, sf_dir):
    """The removal decision on top of the ExactSubstr span operator: per
    document, the repeated-content token count vs total tokens; a doc is
    dropped when MORE THAN HALF its tokens sit in cross-document repeated
    spans (threshold compared in exact integers — dup*2 > total — so no
    float boundary). The spans sub-plan is the bounded-shuffle pipeline
    of pipe_longsubstring_spans; this adds one per-doc sum + a
    broadcastable join back to the corpus token counts."""
    from flink_spark.llm.dedup import long_substring_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = long_substring_spans(docs, window=5)
    dup = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("long").alias("dup_tokens")
    )
    tok = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_tokens"),
    )
    return (
        tok.join(dup, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("dup_tokens", F.lit(0).cast("long"))
            .alias("dup_tokens"),
            (F.coalesce("dup_tokens", F.lit(0)) * 2 > F.col("n_tokens"))
            .alias("drop_doc"),
        )
    )


def _curation_oracle(final_select: str | None = None) -> str:
    """One-statement DuckDB twin of the full curation chain: Gopher keep
    -> exact dedup (min doc_id per normalized fingerprint) -> MinHash-LSH
    pair-kill (drop the higher id of every verified near-dup pair) ->
    per-source survivor counts + token totals (or ``final_select`` over
    the ``surv`` CTE — the streaming twin emits survivor rows). Reuses
    the deterministic hash family of the llm_minhash_lsh_pairs oracle,
    re-rooted on the survivor set instead of the raw table."""
    from flink_spark.llm import dedup as D
    from flink_spark.queries.llm_suite import _MH_PARAMS_SQL

    if final_select is None:
        final_select = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM surv GROUP BY source"""
    return rf"""
    WITH t AS (SELECT doc_id, source, text,
                      string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    m AS (SELECT doc_id, source, text, len(toks) AS n_words,
                 (length(text) - len(toks) + 1) / len(toks) AS mean_wl,
                 length(text) - length(regexp_replace(text, '[#@\.\*]', '', 'g'))
                   AS n_sym,
                 len(list_intersect(list_distinct(toks),
                     ['the','and','of','to','a'])) AS n_stop
          FROM t),
    q AS (SELECT doc_id, source, text FROM m
          WHERE n_words >= {P.GOPHER_MIN_WORDS}
            AND n_words <= {P.GOPHER_MAX_WORDS}
            AND mean_wl >= {P.GOPHER_MEAN_WORD_LEN_MIN}
            AND mean_wl <= {P.GOPHER_MEAN_WORD_LEN_MAX}
            AND n_sym / length(text) <= {P.GOPHER_MAX_SYMBOL_RATIO}
            AND n_stop >= {P.GOPHER_MIN_STOPWORD_TYPES}),
    ex AS (SELECT doc_id, source, text FROM (
             SELECT *, ROW_NUMBER() OVER (
               PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn
             FROM q) WHERE rn = 1),
    w AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM ex),
    sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM w, LATERAL (SELECT generate_subscripts(ws, 1) AS i) tt
           WHERE i <= len(ws) - 2),
    params(i, a, b) AS (VALUES {_MH_PARAMS_SQL}),
    hashed AS (SELECT doc_id,
                      (('0x' || substr(md5(shingle), 1, 15))::BIGINT) % {D.MH_PRIME} AS h
               FROM sh),
    sig AS (SELECT doc_id, i, MIN((a * h + b) % {D.MH_PRIME}) AS mh
            FROM hashed CROSS JOIN params GROUP BY doc_id, i),
    bands AS (SELECT doc_id, i // {D.MH_BAND_ROWS} AS band,
                     string_agg(mh::VARCHAR, ',' ORDER BY i) AS bsig
              FROM sig GROUP BY doc_id, i // {D.MH_BAND_ROWS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
    agree AS (SELECT c.doc_a, c.doc_b,
                     SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS n_agree
              FROM cand c
              JOIN sig x ON x.doc_id = c.doc_a
              JOIN sig y ON y.doc_id = c.doc_b AND y.i = x.i
              GROUP BY c.doc_a, c.doc_b),
    kill AS (SELECT DISTINCT doc_b AS doc_id FROM agree
             WHERE n_agree >= {D.MH_K // 2}),
    surv AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM kill))
    {final_select}
    """


@query("pipe_curation_e2e", oracle=_curation_oracle())
def pipe_curation_e2e(spark, sf_dir):
    """END-TO-END curation pipeline as ONE DataFrame plan — the
    composition a 100 TB training-data run executes, not just its pieces:
    Gopher quality gate (JVM expressions) -> exact dedup (one hash
    shuffle on the normalized fingerprint, keep min doc_id) ->
    MinHash-LSH near-dup pair-kill over the SURVIVORS (banded equality
    joins, drop the higher id of every verified pair) -> per-source
    survivor counts and token totals. Every stage is the already-gated
    operator re-rooted on the previous stage's output; the oracle chains
    the same CTEs, so the whole composition is value-checked exactly."""
    from flink_spark.llm import dedup as D
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    kept = P.gopher_quality_flags(docs).filter(F.col("keep")).select(
        "doc_id", "source", "text"
    )
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    wfp = Window.partitionBy(fp).orderBy("doc_id")
    ex = (
        kept.withColumn("__rn", F.row_number().over(wfp))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    pairs = D.minhash_lsh_pairs(ex)
    kill = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # the kill list is bounded by the verified near-dup pair count —
    # broadcast it (the static planner under-uses its 42 KiB estimate
    # and AQE leaves the anti-join shuffled); for corpora whose dup set
    # outgrows broadcast, drop the hint and the anti-join shuffles on
    # doc_id — both are correct, this pins the small-side plan
    surv = ex.join(F.broadcast(kill), "doc_id", "left_anti")
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("long"))
            .cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )
