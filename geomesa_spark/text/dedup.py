"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (the part that matters at 100 TB):
- exact: one hash-shuffle on the normalized text key (map-side partial agg).
- n-gram Jaccard: explode distinct shingles -> self-equi-join on shingle ->
  per-pair common counts. The only shuffle key is the shingle; a ``max_df``
  cap drops stop-shingles that would otherwise create quadratic hot keys
  (the same hot-key reasoning as GeoMesa's shard spreading,
  /root/reference/geomesa-index-api/.../api/ShardStrategy.scala:42-80).
- MinHash: signatures are a wide JVM aggregate (k min-hashes over exploded
  shingles — whole-stage codegen, no Python); LSH banding with r=2 rows per
  band turns the quadratic candidate space into an equi-join on band values;
  candidates are then verified with the exact Jaccard, so the output has no
  false positives and recall 1-(1-s^2)^64 (> 1 - 1e-8 at s = 0.5).
- SimHash: 64-bit signature from per-token CRC32 sign sums; near-dup pairs
  by pigeonhole banding (4 x 16-bit chunks finds ALL pairs with hamming
  distance <= 3 — exact, not probabilistic) + bit_count(xor) verify.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from geomesa_spark.text.analysis import with_tokens

# Universal-hash modulus for the MinHash permutation family. MUST be small
# enough that a*h wraps the modulus many times (a, h < p => a*h up to ~2^62,
# still safe in a long under ANSI mode) — with a larger modulus the product
# never wraps and every "permutation" is a monotone scaling of the base
# hash, collapsing all signature rows onto the same argmin shingle.
MERSENNE31 = (1 << 31) - 1

# simhash affine-derived hash parameters (h2 = a2*h1+b2, h3 = a3*h1+b3,
# both mod 2^31-1); mirrored bit-exactly in the DuckDB oracle and pytest
SIMHASH_A2, SIMHASH_B2 = 1000003, 12345
SIMHASH_A3, SIMHASH_B3 = 69069, 54321


def normalized_text(text: str = "text"):
    return F.regexp_replace(F.trim(F.lower(F.col(text))), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text: str = "text") -> DataFrame:
    """Exact dedup on normalized text: keeper = min id per group, plus the
    group size. One shuffle; partial aggregation map-side."""
    return (df.groupBy(normalized_text(text).alias("_norm"))
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("dup_count"))
            .drop("_norm"))


def shingles(df: DataFrame, *, n: int = 3, text: str = "text",
             out: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles as an array column (JVM transform)."""
    d = with_tokens(df, text)
    idx = F.sequence(F.lit(0), F.size("tokens") - n)
    sh = F.when(
        F.size("tokens") >= n,
        F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(
                " ", *[F.element_at("tokens", (i + j + 1).cast("int"))
                       for j in range(n)])))
    ).otherwise(F.array(F.concat_ws(" ", "tokens")))
    return d.withColumn(out, sh).drop("tokens")


def ngram_jaccard_pairs(df: DataFrame, *, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text: str = "text",
                        max_df: int | None = 1000,
                        audit_cap: int | None = None) -> DataFrame:
    """EXACT all-pairs Jaccard over word n-gram shingle sets, with the
    stop-shingle skew guard ON by default.

    ``audit_cap`` (optional, CALLER-VISIBLE semantics change): restrict
    the input to documents with ``id_col < audit_cap`` before pairing —
    the AUDIT-SAMPLE mode. Exact shingle-join cost grows with the sum of
    squared shingle document-frequencies, inherently super-linear on a
    dense-vocabulary corpus (measured 550 s at SF=0.5 uncapped vs ~3 s
    capped), so the production pattern is: calibrate thresholds exactly
    on a capped sample here, then dedup the CORPUS with
    ``minhash_pairs``/``simhash_pairs`` (the scale paths). Leave it
    ``None`` for the exact result over the whole input — a sample must
    be something the caller asked for, never an implicit default.

    jaccard(a,b) = |A∩B| / (|A| + |B| - |A∩B|), pairs with a < b and
    jaccard >= threshold.

    ``max_df`` caps the self-join: a shingle shared by k documents makes
    k^2 join rows, so one stop-shingle ("in the of") turns the equi-join
    quadratic at scale. The guarded path stays EXACT via decomposition:

    - hot shingles (df > max_df) leave the join; there are at most
      total_instances / max_df of them, so the distinct hot set is tiny
      and broadcastable;
    - every document's hot-shingle set rides along as a small array, and
      each candidate pair's common count = kept-join count + size of the
      hot-array intersection — bit-identical to the unguarded count;
    - pairs sharing ONLY hot shingles never become kept-join candidates,
      but such a pair with jaccard >= t forces BOTH docs to be more than
      t/(1+t) hot by distinct-shingle fraction (common <= hot_a and
      common >= t*(na+nb)/(1+t) >= t*na/(1+t)); those boilerplate docs
      form a small compensation set that all-pairs verifies exactly.

    ``max_df=None`` disables the guard (the plain hashed-shingle join)."""
    if audit_cap is not None:
        df = df.where(F.col(id_col) < audit_cap)
    sh = shingles(df, n=n, text=text).select(
        F.col(id_col).alias("_id"), "shingles",
        F.size("shingles").alias("_n"))
    # join on the 64-bit shingle hash, not the string: halves shuffle
    # bytes and join-key comparison cost (collision odds ~1e-19/pair)
    ex = sh.select(
        "_id", "_n",
        F.explode(F.transform("shingles",
                              lambda s: F.xxhash64(s))).alias("_s"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    if max_df is None:
        a = ex.select(F.col("_id").alias("a"), F.col("_n").alias("na"), "_s")
        b = ex.select(F.col("_id").alias("b"), F.col("_n").alias("nb"), "_s")
        pairs = (a.join(b, "_s")
                 .where(F.col("a") < F.col("b"))
                 .groupBy("a", "b", "na", "nb")
                 .agg(F.count("*").alias("common")))
        return (pairs.select("a", "b", F.round(jac, 6).alias("jaccard"))
                .where(F.col("jaccard") >= threshold))

    # tokenize/explode once: the frequency probe AND the join branches all
    # read this frame (lazy lineage would re-run tokenization per branch)
    ex = ex.localCheckpoint()
    freq = ex.groupBy("_s").agg(F.count("*").alias("_df"))
    hot = freq.where(F.col("_df") > max_df).select("_s")
    # short-circuit: the common corpus has NO hot shingles at this cap —
    # one tiny driver probe swaps in the plain exact join and skips the
    # hot-array/compensation machinery's extra shuffles entirely
    if hot.limit(1).count() == 0:
        a = ex.select(F.col("_id").alias("a"), F.col("_n").alias("na"),
                      "_s")
        b = ex.select(F.col("_id").alias("b"), F.col("_n").alias("nb"),
                      "_s")
        pairs = (a.join(b, "_s")
                 .where(F.col("a") < F.col("b"))
                 .groupBy("a", "b", "na", "nb")
                 .agg(F.count("*").alias("common")))
        return (pairs.select("a", "b", F.round(jac, 6).alias("jaccard"))
                .where(F.col("jaccard") >= threshold))
    hot_arr = (ex.join(F.broadcast(hot), "_s")
               .groupBy("_id").agg(F.collect_set("_s").alias("_hot")))
    kept = ex.join(F.broadcast(hot), "_s", "left_anti")
    a = kept.select(F.col("_id").alias("a"), F.col("_n").alias("na"), "_s")
    b = kept.select(F.col("_id").alias("b"), F.col("_n").alias("nb"), "_s")
    cand = (a.join(b, "_s")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b", "na", "nb")
            .agg(F.count("*").alias("_ck")))
    ha = hot_arr.select(F.col("_id").alias("a"), F.col("_hot").alias("_ha"))
    hb = hot_arr.select(F.col("_id").alias("b"), F.col("_hot").alias("_hb"))
    main = (cand.join(ha, "a", "left").join(hb, "b", "left")
            .withColumn("common", F.col("_ck") + F.when(
                F.col("_ha").isNull() | F.col("_hb").isNull(), F.lit(0))
                .otherwise(F.size(F.array_intersect("_ha", "_hb"))))
            .select("a", "b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
    # compensation: boilerplate docs (> t/(1+t) hot by distinct shingles)
    frac = threshold / (1.0 + threshold)
    hot_docs = (hot_arr.withColumnRenamed("_id", "_hid")
                .join(sh, F.col("_hid") == F.col("_id"))
                .where(F.size("_hot") > frac * F.col("_n"))
                .select("_id", "shingles", "_n"))
    ca = hot_docs.select(F.col("_id").alias("a"),
                         F.col("shingles").alias("_sa"),
                         F.col("_n").alias("na"))
    cb = hot_docs.select(F.col("_id").alias("b"),
                         F.col("shingles").alias("_sb"),
                         F.col("_n").alias("nb"))
    common = F.size(F.array_intersect("_sa", "_sb"))
    comp = (ca.join(cb, F.col("a") < F.col("b"))
            .withColumn("common", common)
            .select("a", "b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
    return main.unionByName(comp).dropDuplicates(["a", "b"])


def _minhash_coeffs(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=k)
    b = rng.integers(0, MERSENNE31, size=k)
    return a, b


def _signatures_from_shingles(sh: DataFrame, *, k: int,
                              id_col: str = "doc_id",
                              seed: int = 7,
                              hashed_col: str | None = None) -> DataFrame:
    """k-wide signatures computed ROW-WISE in one Arrow-vectorized kernel
    (k x n_shingles matrix min per doc) — no explode, no shuffle: the
    k-permutation min is per-document math, so turning it into k wide
    aggregates over exploded rows (the previous shape) paid an explode +
    hash-shuffle for work a numpy matmul-style pass does in place.

    The base shingle hash runs JVM-SIDE (``transform`` + built-in
    ``crc32`` over the utf-8 bytes, whole-stage codegen — java.util.zip
    CRC32 == zlib.crc32, same polynomial/init): what crosses Arrow is a
    compact long array, and the Python kernel is pure numpy (no
    per-string Python hashing). Signatures are bit-equal to both prior
    forms."""
    a, b = (x.astype(np.int64) for x in _minhash_coeffs(k, seed))
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def sigs(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            hs = np.asarray(arr, dtype=np.int64) % MERSENNE31
            sig = ((a[:, None] * hs[None, :] + b[:, None])
                   % MERSENNE31).min(axis=1)
            out.append(sig.tolist())
        return pd.Series(out)

    # reuse a caller-materialized crc32 column when present (minhash_pairs
    # checkpoints one) instead of re-hashing every shingle string
    hashed = (F.col(hashed_col) if hashed_col is not None
              else F.transform(F.col("shingles"),
                               lambda s: F.crc32(F.encode(s, "UTF-8"))))
    return sh.select(F.col(id_col), sigs(hashed).alias("_sig")) \
        .select(id_col, *[F.element_at("_sig", i + 1).alias(f"mh{i}")
                          for i in range(k)])


def minhash_signatures(df: DataFrame, *, k: int = 128, n: int = 3,
                       id_col: str = "doc_id", text: str = "text",
                       seed: int = 7) -> DataFrame:
    """k-wide MinHash signature per document as k columns ``mh0..mh{k-1}``.

    Base shingle hash = crc32 reduced mod 2^31-1 (JVM); permutation i =
    (a_i*h + b_i) mod 2^31-1 — a proper universal-hash family (products
    < 2^62, ANSI-safe). Entirely whole-stage-codegen: explode + wide min
    aggregate."""
    return _signatures_from_shingles(shingles(df, n=n, text=text),
                                     k=k, id_col=id_col, seed=seed)


def minhash_pairs(df: DataFrame, *, threshold: float = 0.5, k: int = 128,
                  n: int = 3, id_col: str = "doc_id", text: str = "text",
                  seed: int = 7) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    Bands of r=2 signature rows; docs sharing any band value become
    candidates (equi-join on (band, v0, v1)); every candidate is verified
    with the exact shingle-set Jaccard so the output contains no false
    positives. Output: (a, b, jaccard) with a < b, jaccard >= threshold."""
    r = 2
    bands = k // r
    # the shingle frame feeds three plan branches (signatures + both
    # verification sides); localCheckpoint (eager) runs tokenization once
    # and, unlike persist(), lets the ContextCleaner reclaim the blocks
    # when this frame goes out of scope — repeated calls (bench loops)
    # don't accumulate executor storage for the session lifetime
    sh_base = shingles(df, n=n, text=text).select(
        F.col(id_col), "shingles",
        F.transform("shingles",
                    lambda s: F.crc32(F.encode(s, "UTF-8"))).alias("_hsh")
    ).localCheckpoint()
    sig = _signatures_from_shingles(sh_base, k=k, id_col=id_col, seed=seed,
                                    hashed_col="_hsh")
    # Band key = xxhash64(band_idx, v0, v1) — a single long instead of a
    # (int, long, long) struct. The narrow key shrinks the band-join
    # shuffle rows ~12 bytes each (113M join rows at SF=1.0) and sorts /
    # compares as one word in the merge stage (sf0.1 cand stage 3.3 ->
    # 1.8 s cold). A 64-bit collision can only MERGE two band buckets,
    # i.e. ADD candidate pairs (expected extra ~ n_keys^2/2^65 ~ 1e-7 at
    # SF=1.0) — the screen + exact verify remove them; no true pair can
    # ever be lost, since equal band values always hash equal.
    band_arr = F.array(*[
        F.xxhash64(F.lit(i), F.col(f"mh{r * i}"), F.col(f"mh{r * i + 1}"))
        for i in range(bands)])
    # Signature-estimate screen, row-local INSIDE the band-join stage:
    # the matching-component fraction of the two minhash signatures is
    # an unbiased estimator of the pair's Jaccard (E[matches/k] = j),
    # already concentrated at k=128 samples. Screening at
    # (threshold - 0.25) keeps every true pair up to a Hoeffding miss
    # of exp(-2k*0.25^2) ~ 1e-7 — the same order as the banding's own
    # documented (1-t^r)^bands miss — while the low-Jaccard background
    # mass (boilerplate corpora: j ~ 0.1-0.2 pairs band-collide almost
    # surely at r=2) passes with probability ~3e-5. This is the shape
    # fix the SF=1.0 profile demanded: 113M raw candidates for 258
    # true pairs, with the old distinct() + array-attach joins costing
    # 87 of a 140 s wall. The screen needs NO extra shuffle — the
    # estimate rides the band-join stage itself — and everything
    # downstream (dedup, crc32 pre-verify, exact verify) touches only
    # screen survivors.
    #
    # Representation matters as much as the screen (profiled at SF=1.0,
    # 113M joined rows): carrying the k components as flat long columns
    # made the join stage 81 s — 2x128 longs per join row fatten the
    # band-join shuffle ~20x over the narrow (id, band) join (8 s), and
    # the 128-term equality sum strains codegen. So the components ride
    # the explode TRUNCATED to 8 bits and PACKED 7 per long (bits 56+
    # stay zero so every SWAR intermediate fits a signed long — no ANSI
    # overflow). The per-pair match count is a SWAR zero-byte test per
    # packed pair — d = xor(pa, pb); a zero 8-bit lane is detected by
    # the canonical ((d & 0x7f..) + 0x7f..) | d MSB trick; bit_count of
    # the MSB mask — summed across the ceil(k/7) longs: ~20 cheap
    # bitwise ops per long, comfortably inside whole-stage codegen.
    # Truncation can only INFLATE the match count (a differing
    # component collides in its low 8 bits with prob 1/256), so the
    # screen keeps a strict SUPERSET of exact component equality: the
    # Hoeffding keep-side guarantee is intact, and the ~k/256 expected
    # extra background matches are absorbed by the cut's 0.25 margin.
    # Measured at SF=1.0: join+screen 81 s -> ~10 s, identical pairs.
    lanes = 7
    n_packed = (k + lanes - 1) // lanes
    spare = n_packed * lanes - k  # all-zero lanes always "match"
    packed = [
        reduce(lambda acc, term: acc.bitwiseOR(term),
               [F.shiftleft(F.col(f"mh{j * lanes + i}")
                            .bitwiseAND(F.lit(255)), 8 * i)
                for i in range(lanes) if j * lanes + i < k]).alias(f"pk{j}")
        for j in range(n_packed)]
    ex = sig.select(F.col(id_col).alias("_id"), *packed,
                    F.explode(band_arr).alias("bd"))
    left = ex.select(F.col("_id").alias("a"),
                     *[F.col(f"pk{j}").alias(f"_pa{j}")
                       for j in range(n_packed)], "bd")
    right = ex.select(F.col("_id").alias("b"),
                      *[F.col(f"pk{j}").alias(f"_pb{j}")
                        for j in range(n_packed)], "bd")
    low7 = F.lit(0x007F7F7F7F7F7F7F)
    msb7 = F.lit(0x0080808080808080)
    matches = None
    for j in range(n_packed):
        d = F.col(f"_pa{j}").bitwiseXOR(F.col(f"_pb{j}"))
        y = d.bitwiseAND(low7) + low7
        zmask = F.bitwise_not(y.bitwiseOR(d).bitwiseOR(low7)) \
            .bitwiseAND(msb7)
        term = F.bit_count(zmask)
        matches = term if matches is None else matches + term
    est_cut = int(np.ceil(max(0.0, threshold - 0.25) * k)) + spare
    # merge-hint the band self-join: its OUTPUT (113M band collisions at
    # SF=1.0) dwarfs both inputs (3.2M rows), the regime where a
    # broadcast hash join loses badly — every probe of the ~550MB hashed
    # relation is a random-memory chain walk (measured 121 s), while the
    # sort-merge scans matched groups sequentially and evaluates the
    # screen inline in the merge stage (measured 10-16 s). AQE's
    # broadcast planning only models INPUT sizes, so it cannot see
    # output-dominated joins. Measured faster at every fixture SF
    # (sf0.1: 5.9 vs 8.3 s; SF=1.0: 26 vs 121 s); skew stays handled
    # (AQE skew-join applies to SMJ).
    cand = (left.hint("merge").join(right.hint("merge"), "bd")
            .where(F.col("a") < F.col("b"))
            .where(matches >= F.lit(est_cut))
            .select("a", "b"))
    # Hashed pre-verify: boilerplate-heavy corpora have a high BACKGROUND
    # Jaccard (hot shingles live in most docs), so band candidates vastly
    # outnumber real pairs — measured 18.9M candidates for 257 pairs at
    # SF=0.5, with the exact string intersect taking ~70% of the wall.
    # The crc32 long arrays (one JVM pass, 2.5x smaller than the strings,
    # ~5x cheaper to intersect) give a Jaccard within +-2c/|union| of the
    # exact value for c within-pair collisions (P(c>=1) ~ 1e-4 per pair).
    # The 0.05 slack therefore admits extra pairs into the exact verify
    # rather than dropping true ones whenever |union| >= 40c; a true pair
    # can only slip past the screen if a collision lands inside a SMALL
    # union (P ~ 1e-8/pair) — comparable to the banding's own documented
    # miss probability, and far below the exact-oracle gate's corpus odds.
    ha = sh_base.select(F.col(id_col).alias("a"),
                        F.col("_hsh").alias("_ha"))
    hb = sh_base.select(F.col(id_col).alias("b"),
                        F.col("_hsh").alias("_hb"))
    hcommon = F.size(F.array_intersect("_ha", "_hb"))
    hjac = hcommon / (F.size("_ha") + F.size("_hb") - hcommon)
    # dedup AFTER the signature screen: it touches survivors (~the
    # true-pair count), not the 10^8 band collisions
    pre = (cand.distinct()
           .join(ha, "a").join(hb, "b")
           .where(hjac >= threshold - 0.05)
           .select("a", "b"))
    pa = sh_base.select(F.col(id_col).alias("a"),
                        F.col("shingles").alias("_sa"))
    pb = sh_base.select(F.col(id_col).alias("b"),
                        F.col("shingles").alias("_sb"))
    joined = pre.join(pa, "a").join(pb, "b")
    common = F.size(F.array_intersect("_sa", "_sb"))
    jac = common / (F.size("_sa") + F.size("_sb") - common)
    return (joined.select("a", "b", F.round(jac, 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def _simhash_bit_source(b: int) -> tuple[int, int]:
    """(hash index 1..3, bit position) feeding signature bit ``b``.

    The char-fold hashes are mod 2^31-1 so each supplies only 31 live
    bits; three multipliers (31/37/41) cover all 64 signature bits with
    no dead positions (bit 31 of a single 31-bit hash is always zero)."""
    if b < 31:
        return 1, b
    if b < 62:
        return 2, b - 31
    return 3, b - 62


def simhash(df: DataFrame, *, id_col: str = "doc_id", text: str = "text",
            out: str = "simhash") -> DataFrame:
    """64-bit SimHash: bit b is set iff sum over tokens of
    (+1 if hash(token) has bit b else -1) > 0. Wide JVM aggregate.

    Token hash = char-fold polynomial hash (three multipliers cover the
    64 signature bits with live positions) — the same arithmetic runs in
    the DuckDB oracle, making the near-dup pairs value-checked, not
    rows-only."""
    from pyspark.sql.types import LongType

    from geomesa_spark.text.analysis import char_hash_expr
    # one char-fold per token, computed JVM-side over the token ARRAY —
    # no explode, no groupBy shuffle: what crosses Arrow is one long
    # array per doc, and the 64 bit-sums are a per-document numpy kernel.
    # h2/h3 derive by affine universal hashes (a*h+b mod 2^31-1) — same
    # independence class as separate folds at a third of the cost; the
    # DuckDB oracle replicates the identical arithmetic over exploded
    # tokens (sum per doc == sum per doc, any execution shape).
    idx_pos = [_simhash_bit_source(b) for b in range(64)]
    src = np.array([i - 1 for i, _ in idx_pos], dtype=np.int64)
    pos = np.array([p for _, p in idx_pos], dtype=np.int64)
    bitvals = np.array([-(1 << 63) if b == 63 else (1 << b)
                        for b in range(64)], dtype=np.int64)

    @F.pandas_udf(LongType())
    def sig_kernel(hashes: pd.Series) -> pd.Series:
        # one flattened kernel per Arrow batch, NOT a per-document loop:
        # all token hashes concatenate into one vector, each signature
        # bit is one shift+mask over the whole batch, and the per-doc
        # +1/-1 sums come from np.add.reduceat at document offsets
        # (counts_b = 2*S_b - n_tokens, S_b = per-doc set-bit count).
        n_docs = len(hashes)
        out_v = np.zeros(n_docs, dtype=np.int64)
        if n_docs == 0:
            return pd.Series(out_v)
        arrs = [np.asarray(a, dtype=np.int64) for a in hashes]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                           count=n_docs)
        # upstream drops token-less docs; an empty segment would make
        # reduceat read the NEXT doc's first element, so never mix them
        if lens.min() <= 0:
            raise ValueError("simhash sig_kernel requires non-empty "
                             "token arrays (filter size(tokens) > 0)")
        flat = np.concatenate(arrs)
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        h = np.stack([flat,
                      (flat * SIMHASH_A2 + SIMHASH_B2) % MERSENNE31,
                      (flat * SIMHASH_A3 + SIMHASH_B3) % MERSENNE31])
        for b in range(64):
            bit = (h[src[b]] >> pos[b]) & 1
            set_cnt = np.add.reduceat(bit, offsets)
            out_v |= bitvals[b] * (2 * set_cnt > lens)
        return pd.Series(out_v)

    hashed = F.transform("tokens", lambda t: char_hash_expr(t, 31))
    return (with_tokens(df, text)
            .where(F.size("tokens") > 0)  # explode-path drop semantics
            .select(F.col(id_col), sig_kernel(hashed).alias(out)))


def hamming_pairs(df: DataFrame, *, fp_col: str, id_col: str,
                  max_hamming: int, n_chunks: int | None = None
                  ) -> DataFrame:
    """All id pairs whose int64 fingerprints are within ``max_hamming``
    bits — EXACT, for any 64-bit fingerprint column (simhash, image
    phash, rolling doc hash).

    Pigeonhole banding generalized: the word splits into ``n_chunks``
    (default max_hamming + 1) near-even bit chunks; a pair within
    ``max_hamming`` cannot differ in every chunk, so the chunk equi-join
    finds every such pair, and bit_count(xor) verifies the distance.
    Wider chunks keep the join selective — at billions of rows keep
    chunks >= 8 bits (n_chunks <= 8 -> max_hamming <= 7) or pre-block on
    another key first.

    Two structural economies over the naive chunk self-join:

    * The join runs over DISTINCT fingerprints, not rows. Near-dup
      corpora carry heavy exact fingerprint duplication (the SF=1.0
      documents fixture: 50k rows / 4,953 distinct simhashes), and the
      chunk join's collision output grows QUADRATICALLY in each hot
      bucket's multiplicity — deduplicating first shrinks that ~100x
      here, then two id-expansion joins (plus a same-fp self-join for
      the hamming-0 pairs) restore the row-level pairs, each
      output-proportional.
    * No pair-level ``distinct()``: a fingerprint pair within
      ``max_hamming`` matches in possibly several chunks, and is
      emitted only at the FIRST equal chunk — a row-local codegen
      filter on xor's per-chunk zeroness — so the dedup shuffle
      disappears entirely.

    Output: (a, b, hamming), a < b."""
    n = n_chunks if n_chunks is not None else max_hamming + 1
    if not 1 <= n <= 64:
        raise ValueError(f"n_chunks must be in [1, 64], got {n}")
    if n < max_hamming + 1:
        raise ValueError(
            f"{n} chunks cannot be exact for hamming {max_hamming}")
    base, extra = divmod(64, n)
    chunks, masks, off = [], [], 0
    for c in range(n):
        width = base + (1 if c < extra else 0)
        chunks.append(F.struct(
            F.lit(c).alias("c"),
            F.shiftrightunsigned("_fp", off)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("v")))
        masks.append(((1 << width) - 1) << off)
        off += width
    # the (id, fp) projection feeds FOUR plan branches (distinct fps,
    # both id expansions, the same-fp self-join); lazy lineage would
    # recompute the upstream fingerprint kernel per branch — 5x the
    # signature cost when df is a computed simhash/phash frame.
    # localCheckpoint (lazy) materializes it once at the first action
    # and lets the ContextCleaner reclaim the blocks on GC.
    ids = df.select(F.col(id_col).alias("_id"),
                    F.col(fp_col).alias("_fp")) \
        .localCheckpoint(eager=False)
    uniq = ids.select("_fp").distinct()
    ex = uniq.select("_fp", F.explode(F.array(*chunks)).alias("ck"))
    left = ex.select(F.col("_fp").alias("_ha"), "ck")
    right = ex.select(F.col("_fp").alias("_hb"), "ck")
    xor = F.col("_ha").bitwiseXOR(F.col("_hb"))
    # verify INSIDE the join stage: bit_count is row-local codegen, so
    # only true fingerprint pairs survive into the expansion joins.
    # merge-hint the chunk self-join: clustered fingerprints put most
    # rows in hot chunk buckets, so the join OUTPUT dwarfs its inputs
    # (172M collisions from 200k chunk rows at SF=1.0 before the
    # distinct-fp dedup) — sort-merge streams matched groups
    # sequentially (4.4 s) where the broadcast hash probe walks random
    # chains per collision (17.8 s); AQE's input-size-only broadcast
    # model cannot see output-dominated joins.
    first_eq = F.lit(n - 1)
    for c in range(n - 2, -1, -1):
        first_eq = F.when(xor.bitwiseAND(F.lit(masks[c])) == 0,
                          F.lit(c)).otherwise(first_eq)
    fpp = (left.hint("merge").join(right.hint("merge"), "ck")
           .where(F.col("_ha") < F.col("_hb"))
           .where(F.bit_count(xor) <= max_hamming)
           .where(F.col("ck.c") == first_eq)
           .select("_ha", "_hb",
                   F.bit_count(xor).alias("hamming")))
    a_side = ids.select(F.col("_id").alias("_ia"),
                        F.col("_fp").alias("_ha"))
    b_side = ids.select(F.col("_id").alias("_ib"),
                        F.col("_fp").alias("_hb"))
    cross = (fpp.join(a_side, "_ha").join(b_side, "_hb")
             .where(F.col("_ia") != F.col("_ib"))  # duplicate-id guard
             .select(F.least("_ia", "_ib").alias("a"),
                     F.greatest("_ia", "_ib").alias("b"), "hamming"))
    same = (ids.select(F.col("_id").alias("a"), "_fp")
            .join(ids.select(F.col("_id").alias("b"), "_fp"), "_fp")
            .where(F.col("a") < F.col("b"))
            .select("a", "b",
                    F.lit(0).cast("integer").alias("hamming")))
    return cross.unionByName(same)


def simhash_pairs(df: DataFrame, *, max_hamming: int = 3,
                  id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """All pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: with 4 16-bit chunks, any pair within hamming 3
    shares at least one chunk, so the chunk equi-join finds every such pair
    (exact); bit_count(xor) filters the verified distance."""
    assert max_hamming <= 3, "4-chunk pigeonhole is exact only for <= 3"
    sig = simhash(df, id_col=id_col, text=text)
    return hamming_pairs(sig, fp_col="simhash", id_col=id_col,
                         max_hamming=max_hamming, n_chunks=4)


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame, *,
                          n: int = 3, id_col: str = "doc_id",
                          text: str = "text",
                          flag_ratio: float = 0.05) -> DataFrame:
    """Benchmark decontamination: for every corpus document, how many of
    its distinct word n-gram shingles also occur anywhere in a benchmark
    (eval-set) corpus. A training-data pipeline runs this before training
    so eval answers are not memorized from leaked test data.

    Output (only documents with at least one shared shingle): ``id_col``,
    ``n_shared`` (distinct shingles of the doc present in the benchmark),
    ``n_shingles`` (distinct shingles of the doc), ``ratio`` (round 6) and
    ``flagged`` (ratio >= flag_ratio).

    100 TB shape: the benchmark side is an eval SUITE — thousands of
    documents, millions of shingles at most — so its distinct-shingle set
    is reduced once and BROADCAST; the corpus side is a narrow
    project → explode → broadcast LEFT SEMI join → one partial-aggregated
    groupBy on the doc id. One corpus-sized shuffle total (the per-doc
    counts). Both sides explode the 64-bit xxhash64 of each shingle, the
    same discipline as ``ngram_jaccard_pairs``: 8-byte join keys instead
    of n-gram strings, and the hash `transform` keeps the explode child
    cheap to re-evaluate (exploding the raw shingle-construction
    expression re-runs the whole array build per OUTPUT row — measured
    9.5 s vs 0.3 s on a 260k-shingle fixture). A hash collision between
    two DIFFERENT shingles (~1e-19/pair) could overcount n_shared by 1;
    the DuckDB oracle joins the strings themselves and stays exact.
    """
    # NULL text never contaminates and never contributes benchmark
    # shingles: Spark's concat_ws folds a NULL token array to '' where
    # SQL engines keep NULL (which never equi-joins), so filtering here
    # keeps the operator's semantics engine-independent
    corpus = corpus.where(F.col(text).isNotNull())
    benchmark = benchmark.where(F.col(text).isNotNull())
    c = shingles(corpus, n=n, text=text).select(
        id_col, F.size("shingles").cast("long").alias("n_shingles"),
        F.explode(F.transform("shingles",
                              lambda s: F.xxhash64(s))).alias("_sg"))
    b = (shingles(benchmark, n=n, text=text)
         .select(F.explode(F.transform(
             "shingles", lambda s: F.xxhash64(s))).alias("_sg"))
         .distinct())
    hit = c.join(F.broadcast(b), "_sg", "left_semi")
    return (hit.groupBy(id_col, "n_shingles")
            .agg(F.count("*").alias("n_shared"))
            .select(id_col, "n_shared", "n_shingles",
                    F.round(F.col("n_shared") / F.col("n_shingles"), 6)
                    .alias("ratio"))
            .withColumn("flagged", F.col("ratio") >= flag_ratio))
