"""Text analysis: tokenization, quality features, language ID, document
fingerprinting.

Design rule: every operator here is a composition of built-in Catalyst
expressions (whole-stage-codegen'd, zero Python in the hot path). Language
ID and quality scoring are deterministic heuristics whose exact SQL
equivalent runs in the DuckDB oracle; the fingerprint folds per-token CRC32
hashes (Spark ``crc32`` == zlib.crc32, so the pytest oracle is exact)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = r"\s+"

# marker stopwords per language for the n-gram/stopword-hit heuristic;
# ties break toward the earlier entry. 'und' when no marker hits.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "las", "es", "y"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}

STOPWORDS = LANG_MARKERS["en"]

FP_MULT = 31           # polynomial rolling-hash base
FP_MOD = (1 << 31) - 1  # Mersenne-31 modulus: products stay < 2^42, so the
                        # fold never overflows a long under ANSI mode


def char_hash_expr(col: Column, mult: int = FP_MULT,
                   mod: int = FP_MOD) -> Column:
    """Polynomial hash of a string, char by char:

        h = fold(chars, 0, (acc, c) -> (acc * mult + ascii(c)) mod mod)

    Chosen over crc32/xxhash because the identical fold runs in DuckDB
    (list_reduce + ascii), giving the oracle bit-exact parity. Pure JVM:
    split-to-chars + aggregate, whole-stage codegen."""
    return F.aggregate(
        F.filter(F.split(col, ""), lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * mult + F.ascii(c)) % mod)


def with_tokens(df: DataFrame, text: str = "text",
                out: str = "tokens") -> DataFrame:
    """Whitespace tokens of lower-cased text (the BPE-ish regex split)."""
    return df.withColumn(out, F.split(F.trim(F.lower(F.col(text))), TOKEN_RE))


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-document quality features: length, token stats, punctuation and
    stopword ratios, plus a composite [0,1] quality score.

    All ratios guard against empty documents (NULL-safe division)."""
    d = with_tokens(df, text)
    n_chars = F.length(F.col(text))
    n_tokens = F.size("tokens")
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text),
                                                  r"[^\w\s]", ""))
    n_stop = F.size(F.array_intersect(
        F.array_distinct("tokens"),
        F.array(*[F.lit(s) for s in STOPWORDS])))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0,
                        n_stop / F.size(F.array_distinct("tokens"))) \
        .otherwise(0.0)
    avg_tok = F.when(n_tokens > 0,
                     (n_chars - (n_tokens - 1)) / n_tokens).otherwise(0.0)
    score = (F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
             + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
             + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3)
    return d.select(
        *df.columns,
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(avg_tok, 6).alias("q_avg_token_len"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"))


def lang_id(df: DataFrame, text: str = "text",
            out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language ID: predicted language = argmax over marker
    vocabularies of distinct-token hits; ties break in LANG_MARKERS order;
    zero hits -> 'und'."""
    d = with_tokens(df, text).withColumn("_toks", F.array_distinct("tokens"))
    scores = []
    for rank, (lang, markers) in enumerate(LANG_MARKERS.items()):
        hits = F.size(F.array_intersect(
            F.col("_toks"), F.array(*[F.lit(m) for m in markers])))
        # struct compare: (hits, -rank) lexicographic => max hits, then
        # earliest language wins the tie
        scores.append(F.struct(hits.alias("h"),
                               F.lit(-rank).alias("r"),
                               F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))
    return d.withColumn(out, pred).drop("tokens", "_toks")


def fingerprint(df: DataFrame, text: str = "text",
                out: str = "fp") -> DataFrame:
    """Order-sensitive rolling document fingerprint:

        fp = fold(tokens, 0, (acc, t) -> (acc*31 + char_hash(t)) mod 2^31-1)

    where char_hash is the char-fold polynomial hash (``char_hash_expr``) —
    the same arithmetic runs in the DuckDB oracle, so the fingerprint is
    value-checked end to end, not just rows-only."""
    d = with_tokens(df, text)
    fp = F.aggregate(
        "tokens",
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MULT + char_hash_expr(t)) % FP_MOD)
    return d.withColumn(out, fp).drop("tokens")


def token_count(text: str = "text") -> Column:
    return F.size(F.split(F.trim(F.lower(F.col(text))), TOKEN_RE))


def repetition_features(df: DataFrame, *, id_col: str = "doc_id",
                        text: str = "text",
                        top_bigram_max: float = 0.18,
                        dup_token_max: float = 0.6) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1,
    the published web-corpus filtering recipe): per document,

    - ``rep_dup_token_frac``  = 1 - distinct_tokens / tokens
    - ``rep_top_bigram_share`` = occurrences of the most frequent token
      bigram / total bigrams
    - ``rep_flagged`` = either ratio above its threshold — the row a
      training pipeline drops.

    100 TB shape: ZERO shuffles and zero Python — the bigram mode is a
    per-document statistic, so it never needs the corpus-wide
    (doc, bigram) exchange a groupBy would pay (measured 12 s of pure
    shuffle at SF=0.5 for the groupBy form). Instead the mode count is
    the max run length of the doc's SORTED bigram array, computed with
    `array_sort` + an `aggregate` fold entirely inside whole-stage
    codegen: O(L log L) per doc, map-only, construction-exact."""
    d = with_tokens(df, text)
    n_tokens = F.size("tokens")
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(F.sequence(F.lit(1), n_tokens - 1),
                    lambda i: F.concat_ws(" ", F.element_at("tokens", i),
                                          F.element_at("tokens", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    # mode count = longest run in the sorted array (exact, no hashing)
    top_count = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .alias("run"),
            F.greatest(acc["best"],
                       F.when(x == acc["prev"], acc["run"] + 1)
                       .otherwise(F.lit(1))).alias("best")),
        lambda acc: acc["best"])
    base = d.select(
        F.col(id_col), n_tokens.alias("_nt"),
        F.size(F.array_distinct("tokens")).alias("_ndt"),
        top_count.alias("_top"))
    dup_frac = F.when(F.col("_nt") > 0,
                      1.0 - F.col("_ndt") / F.col("_nt")).otherwise(0.0)
    top_share = F.when(F.col("_nt") >= 2,
                       F.col("_top") / (F.col("_nt") - 1)).otherwise(0.0)
    return base.select(
        F.col(id_col),
        F.col("_nt").alias("rep_tokens"),
        F.round(dup_frac, 6).alias("rep_dup_token_frac"),
        F.round(top_share, 6).alias("rep_top_bigram_share"),
        ((top_share > top_bigram_max)
         | (dup_frac > dup_token_max)).alias("rep_flagged"))


# Conservative PII patterns valid with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded/unbounded repeats,
# no backreferences, no lookaround, no \b.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_IDNUM = r"\d{9,}"


def pii_mask(df: DataFrame, *, text: str = "text",
             out: str = "masked") -> DataFrame:
    """Mask common PII (emails, IPv4 addresses, long id-like digit runs)
    and count each kind — the redaction pass a training-data pipeline
    runs before a corpus leaves quarantine. Pure Catalyst
    ``regexp_replace``/``regexp_count`` (whole-stage codegen, zero
    Python), so the pass is one narrow projection at any corpus size.

    Masking is STAGED — emails first, then IPv4 over the email-masked
    text, then id-runs over that — and each count is taken on the stage
    input its masking sees, so counts always equal the number of
    replacements performed (an email's digits can never double-count as
    an id-run). Extension operator per the task brief's training-data
    pipeline category; the reference has no PII surface."""
    t0 = F.col(text)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_ids = F.regexp_count(t2, F.lit(PII_IDNUM))
    t3 = F.regexp_replace(t2, PII_IDNUM, "<ID>")
    return df.withColumns({
        "n_emails": n_emails, "n_ips": n_ips, "n_idnums": n_ids,
        out: t3})


# URL pattern in the same shared Java-regex/RE2 subset as the PII set
URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"
URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def url_host_stats(df: DataFrame, *, text: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-host URL frequency over a corpus: extract every URL, reduce to
    its host, count mentions and distinct documents. The domain-mixing
    profile a training-data pipeline computes before reweighting or
    filtering sources. Catalyst-only (regexp_extract_all + explode +
    one partial-aggregated groupBy); the explode carries just the URL
    strings, never the document text."""
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text), F.lit(URL_RE),
                                       F.lit(0))).alias("url"))
    host = F.regexp_extract("url", URL_HOST_RE, 1)
    return (urls.select(id_col, host.alias("host"))
            .groupBy("host")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct(id_col).alias("n_docs")))
