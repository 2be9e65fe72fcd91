"""Training-data pipeline operators vs brute-force Python/numpy oracles
(the reference's cartesian-oracle test pattern, SparkSQLDataTest.scala:
344-351, applied to text dedup + similarity)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
MASK = (1 << 64) - 1


def _signed64(v: int) -> int:
    v &= MASK
    return v - (1 << 64) if v >= (1 << 63) else v


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    planted = spark.createDataFrame(
        [(9001, "alpha beta gamma delta epsilon zeta eta theta", "en", "t", 1),
         (9002, "alpha beta gamma delta epsilon zeta eta theta", "en", "t", 1),
         (9003, "alpha beta gamma delta epsilon zeta eta IOTA", "en", "t", 1),
         (9004, "totally different words entirely unrelated content here now",
          "en", "t", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    return base.unionByName(planted).cache()


@pytest.fixture(scope="module")
def local_docs(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def _toks(t):
    return re.split(r"\s+", t.strip().lower())


def _shingles(t, n=3):
    toks = _toks(t)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _char_hash(t, mult=31, mod=(1 << 31) - 1):
    h = 0
    for c in t:
        h = (h * mult + ord(c)) % mod
    return h


class TestAnalysis:
    def test_quality_features_match_python(self, docs, local_docs):
        from geomesa_spark.text.analysis import STOPWORDS, quality_features
        rows = {r["doc_id"]: r for r in quality_features(docs).collect()}
        for did in list(local_docs)[:10]:
            text = local_docs[did]
            toks = _toks(text)
            got = rows[did]
            assert got["q_chars"] == len(text)
            assert got["q_tokens"] == len(toks)
            n_punct = sum(1 for c in text if not (c.isalnum() or c.isspace()
                                                  or c == "_"))
            assert got["q_punct_ratio"] == pytest.approx(
                n_punct / len(text), abs=1e-6)
            distinct = set(toks)
            assert got["q_stopword_ratio"] == pytest.approx(
                len(distinct & set(STOPWORDS)) / len(distinct), abs=1e-6)

    def test_lang_id_deterministic_heuristic(self, spark):
        from geomesa_spark.text.analysis import lang_id
        df = spark.createDataFrame(
            [(1, "the cat and the dog is a pet"),
             (2, "der hund ist nicht die katze und"),
             (3, "el perro y la casa es los las"),
             (4, "xyzzy plugh quux"),
             (5, "the der")],  # tie: en (1 hit) vs de (1 hit) -> en first
            "doc_id long, text string")
        got = {r["doc_id"]: r["lang_pred"]
               for r in lang_id(df).collect()}
        assert got == {1: "en", 2: "de", 3: "es", 4: "und", 5: "en"}

    def test_fingerprint_matches_char_fold(self, docs, local_docs):
        from geomesa_spark.text.analysis import FP_MOD, FP_MULT, fingerprint
        rows = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
        for did in list(local_docs)[:10]:
            acc = 0
            for t in _toks(local_docs[did]):
                acc = (acc * FP_MULT + _char_hash(t)) % FP_MOD
            assert rows[did] == acc

    def test_fingerprint_order_sensitive(self, spark):
        from geomesa_spark.text.analysis import fingerprint
        df = spark.createDataFrame([(1, "a b c"), (2, "c b a")],
                                   "doc_id long, text string")
        fps = [r["fp"] for r in fingerprint(df).collect()]
        assert fps[0] != fps[1]

    def test_repetition_features_laws(self, spark):
        from geomesa_spark.text.analysis import repetition_features
        df = spark.createDataFrame(
            [(1, "spam spam spam spam spam spam"),  # one bigram repeated
             (2, "the quick brown fox jumps high"),  # all distinct
             (3, "go go stop go go stop go go"),     # partial repetition
             (4, "single"),                          # no bigrams
             (5, "a b")],                            # exactly one bigram
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in repetition_features(df).collect()}
        assert got[1]["rep_tokens"] == 6
        assert got[1]["rep_dup_token_frac"] == pytest.approx(5 / 6)
        assert got[1]["rep_top_bigram_share"] == 1.0  # 5x "spam spam" / 5
        assert got[1]["rep_flagged"] is True
        assert got[2]["rep_dup_token_frac"] == 0.0
        assert got[2]["rep_top_bigram_share"] == pytest.approx(1 / 5)
        assert got[2]["rep_flagged"] is True  # 0.2 > 0.18 top-bigram gate
        # doc 3: 8 tokens {go:5, stop:2}? -> distinct 2, dup = 6/8;
        # top bigram "go go" appears 3 times of 7
        assert got[3]["rep_dup_token_frac"] == pytest.approx(6 / 8)
        assert got[3]["rep_top_bigram_share"] == pytest.approx(3 / 7)
        assert got[3]["rep_flagged"] is True
        assert got[4]["rep_tokens"] == 1
        assert got[4]["rep_top_bigram_share"] == 0.0
        assert got[4]["rep_flagged"] is False
        assert got[5]["rep_top_bigram_share"] == 1.0
        assert got[5]["rep_flagged"] is True

    def test_repetition_share_below_thresholds_not_flagged(self, spark):
        from geomesa_spark.text.analysis import repetition_features
        text = " ".join(f"w{i}" for i in range(50))  # 49 distinct bigrams
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = repetition_features(df).collect()[0]
        assert r["rep_dup_token_frac"] == 0.0
        assert r["rep_top_bigram_share"] == pytest.approx(1 / 49, abs=1e-6)
        assert r["rep_flagged"] is False


class TestDedup:
    def test_exact_dedup(self, docs, local_docs):
        from geomesa_spark.text.dedup import exact_dedup
        got = {(r["doc_id"], r["dup_count"])
               for r in exact_dedup(docs).collect()}
        norm = {}
        for did, text in local_docs.items():
            norm.setdefault(re.sub(r"\s+", " ", text.strip().lower()),
                            []).append(did)
        want = {(min(v), len(v)) for v in norm.values()}
        assert got == want
        assert (9001, 2) in got  # planted exact dup collapsed

    def test_ngram_jaccard_vs_bruteforce(self, docs, local_docs):
        from geomesa_spark.text.dedup import ngram_jaccard_pairs
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
        want = {}
        items = list(local_docs.items())
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (da, ta), (db, tb) = items[i], items[j]
                a, b = (da, db) if da < db else (db, da)
                sa, sb = _shingles(ta), _shingles(tb)
                jac = len(sa & sb) / len(sa | sb)
                if jac >= 0.3:
                    want[(a, b)] = jac
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-6)
        assert (9001, 9002) in got and got[(9001, 9002)] == 1.0

    @pytest.mark.parametrize("max_df", [1, 2, 5])
    def test_ngram_skew_guard_stays_exact(self, spark, max_df):
        """A tiny max_df forces shingles into the hot set (incl. pairs
        whose ONLY common shingles are hot) — the decomposed path must
        still equal the brute-force jaccard exactly."""
        from geomesa_spark.text.dedup import ngram_jaccard_pairs
        stop = "lorem ipsum dolor"  # one shared stop-phrase per doc
        rows = [(i, f"{stop} unique{i} tail{i} words{i} end{i}")
                for i in range(12)]
        # boilerplate docs made ENTIRELY of the stop shingles (the
        # compensation-pass case: all common shingles are hot)
        rows += [(100, stop + " sit amet"), (101, stop + " sit amet"),
                 (102, stop + " sit amet consectetur")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["a"], r["b"]): r["jaccard"] for r in
               ngram_jaccard_pairs(docs, threshold=0.3,
                                   max_df=max_df).collect()}
        want = {}
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                (da, ta), (db, tb) = rows[i], rows[j]
                a, b = (da, db) if da < db else (db, da)
                sa, sb = _shingles(ta), _shingles(tb)
                jac = len(sa & sb) / len(sa | sb)
                if jac >= 0.3:
                    want[(a, b)] = jac
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-6)
        assert (100, 101) in got  # hot-only pair found by compensation

    def test_ngram_audit_cap_restricts_input(self, spark):
        """audit_cap is the caller-visible sample bound: pairs touching a
        doc at or past the cap never appear; below the cap the result
        equals the uncapped run over the same sample."""
        from geomesa_spark.text.dedup import ngram_jaccard_pairs
        text = "the quick brown fox jumps over the lazy dog tonight"
        docs = spark.createDataFrame(
            [(i, text) for i in (1, 2, 50, 51)],
            "doc_id long, text string")
        capped = {(r["a"], r["b"]) for r in
                  ngram_jaccard_pairs(docs, threshold=0.3,
                                      audit_cap=50).collect()}
        assert capped == {(1, 2)}
        full = {(r["a"], r["b"]) for r in
                ngram_jaccard_pairs(docs, threshold=0.3).collect()}
        assert full == {(1, 2), (1, 50), (1, 51), (2, 50), (2, 51),
                        (50, 51)}

    def test_minhash_pairs_match_bruteforce(self, docs, local_docs):
        from geomesa_spark.text.dedup import minhash_pairs
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in minhash_pairs(docs, threshold=0.5).collect()}
        want = {}
        items = list(local_docs.items())
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (da, ta), (db, tb) = items[i], items[j]
                a, b = (da, db) if da < db else (db, da)
                sa, sb = _shingles(ta), _shingles(tb)
                jac = len(sa & sb) / len(sa | sb)
                if jac >= 0.5:
                    want[(a, b)] = jac
        # verified candidates: no false positives; r=2/b=64 recall ~ 1
        assert set(got) == set(want)
        assert (9001, 9002) in got

    def test_simhash_matches_python(self, spark):
        from geomesa_spark.text.dedup import simhash
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
             (3, "unrelated stuff completely")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
        assert got[1] == got[2]

        def py_simhash(text):
            from geomesa_spark.text.dedup import (SIMHASH_A2, SIMHASH_A3,
                                                  SIMHASH_B2, SIMHASH_B3,
                                                  _simhash_bit_source)
            M = (1 << 31) - 1
            sums = [0] * 64
            for t in _toks(text):
                h1 = _char_hash(t, 31)
                hs = {1: h1,
                      2: (h1 * SIMHASH_A2 + SIMHASH_B2) % M,
                      3: (h1 * SIMHASH_A3 + SIMHASH_B3) % M}
                for b in range(64):
                    idx, pos = _simhash_bit_source(b)
                    sums[b] += 1 if (hs[idx] >> pos) & 1 else -1
            v = sum((1 << b) for b in range(64) if sums[b] > 0)
            return _signed64(v)
        assert got[1] == py_simhash("alpha beta gamma")
        assert got[3] == py_simhash("unrelated stuff completely")

    def test_simhash_no_dead_bits(self, spark):
        # every signature bit position must be derivable as 1: each bit
        # reads a live position (< 31) of one of the three 31-bit hashes
        from geomesa_spark.text.dedup import _simhash_bit_source
        seen = set()
        for b in range(64):
            idx, pos = _simhash_bit_source(b)
            assert 1 <= idx <= 3 and 0 <= pos < 31
            assert (idx, pos) not in seen
            seen.add((idx, pos))

    def test_simhash_pairs_vs_bruteforce(self, docs, local_docs):
        from geomesa_spark.text.dedup import simhash, simhash_pairs
        sigs = {r["doc_id"]: r["simhash"]
                for r in simhash(docs).collect()}
        got = {(r["a"], r["b"], r["hamming"])
               for r in simhash_pairs(docs, max_hamming=3).collect()}
        want = set()
        ids = sorted(sigs)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin((sigs[ids[i]] ^ sigs[ids[j]]) & MASK).count("1")
                if d <= 3:
                    want.add((ids[i], ids[j], d))
        assert got == want
        assert (9001, 9002, 0) in got


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF}/embeddings.parquet").cache()

    @pytest.fixture(scope="class")
    def local_emb(self, emb):
        rows = emb.collect()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        return ids, mat

    def test_cosine_topk_matches_numpy(self, spark, emb, local_emb):
        from geomesa_spark.ml.similarity import cosine_topk
        ids, mat = local_emb
        queries = emb.where(F.col("vec_id") % 100 == 0) \
            .select(F.col("vec_id").cast("string").alias("query_id"),
                    "embedding")
        got = [(r["query_id"], r["rank"], r["vec_id"])
               for r in cosine_topk(emb.repartition(5), queries, 10)
               .orderBy("query_id", "rank").collect()]
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        want = []
        for qid in sorted(ids[ids % 100 == 0], key=lambda v: str(v)):
            qv = nm[ids == qid][0]
            sims = nm @ qv
            order = np.lexsort((ids, -sims))[:10]
            want += [(str(qid), r + 1, int(ids[o]))
                     for r, o in enumerate(order)]
        assert got == want

    def test_lsh_topk_recall(self, spark, emb, local_emb):
        from geomesa_spark.ml.similarity import cosine_topk, lsh_topk
        queries = emb.where(F.col("vec_id") % 100 == 0) \
            .select(F.col("vec_id").cast("string").alias("query_id"),
                    "embedding")
        exact = {(r["query_id"], r["vec_id"])
                 for r in cosine_topk(emb, queries, 10).collect()}
        approx = {(r["query_id"], r["vec_id"])
                  for r in lsh_topk(emb, queries, 10, n_planes=6,
                                    n_tables=8, multiprobe=1).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5  # multi-table hyperplane LSH on random vectors
        # determinism
        approx2 = {(r["query_id"], r["vec_id"])
                   for r in lsh_topk(emb, queries, 10, n_planes=6,
                                     n_tables=8, multiprobe=1).collect()}
        assert approx == approx2

    def test_near_dup_exact_vs_numpy(self, spark, emb, local_emb):
        from geomesa_spark.ml.similarity import embedding_near_dup_pairs
        ids, mat = local_emb
        got = {(r["a"], r["b"]) for r in
               embedding_near_dup_pairs(emb, threshold=0.5).collect()}
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nm @ nm.T
        ii, jj = np.nonzero(sims >= 0.5)
        want = {(int(ids[i]), int(ids[j]))
                for i, j in zip(ii, jj) if ids[i] < ids[j]}
        assert got == want

    def test_near_dup_block_equals_broadcast(self, spark, emb):
        # the distributed block-matrix exact path must reproduce the
        # collect+broadcast baseline bit-for-bit (cos rounded to 6)
        from geomesa_spark.ml.similarity import embedding_near_dup_pairs
        blk = {(r["a"], r["b"], r["cos"]) for r in
               embedding_near_dup_pairs(emb, threshold=0.5, method="block",
                                        n_blocks=3).collect()}
        bc = {(r["a"], r["b"], r["cos"]) for r in
              embedding_near_dup_pairs(emb, threshold=0.5,
                                       method="broadcast").collect()}
        assert blk == bc

    def test_near_dup_lsh_subset_of_exact(self, spark, emb, local_emb):
        from geomesa_spark.ml.similarity import embedding_near_dup_pairs
        ex = {(r["a"], r["b"]) for r in
              embedding_near_dup_pairs(emb, threshold=0.4).collect()}
        lsh = {(r["a"], r["b"]) for r in
               embedding_near_dup_pairs(emb, threshold=0.4,
                                        exact=False).collect()}
        assert lsh <= ex


class TestHammingPairs:
    """Generalized pigeonhole banding over any int64 fingerprint."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, fp long")

    def test_exact_vs_bruteforce(self, spark):
        import itertools
        import random
        rng = random.Random(3)
        rows = [(i, rng.getrandbits(63) - (1 << 62)) for i in range(40)]
        # plant close pairs
        rows += [(100 + i, rows[i][1] ^ (1 << (i * 5 % 63)))
                 for i in range(6)]
        from geomesa_spark.text.dedup import hamming_pairs
        got = {(r.a, r.b, r.hamming) for r in hamming_pairs(
            self._df(spark, rows), fp_col="fp", id_col="id",
            max_hamming=4).collect()}
        want = set()
        for (ia, fa), (ib, fb) in itertools.combinations(rows, 2):
            h = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if h <= 4 and ia != ib:
                want.add((min(ia, ib), max(ia, ib), h))
        assert got == want

    def test_duplicated_fingerprints_exact(self, spark):
        """The distinct-fp rewrite: heavy exact-duplicate groups (the
        hot-bucket regime it optimizes) still yield the exact pair set —
        hamming-0 pairs inside each group, cross pairs between near
        groups, each pair exactly once."""
        import itertools
        rows = []
        base = 0x0123456789ABCDEF
        for g in range(4):          # 4 clusters of 6 identical fps
            fp = base ^ (g << 20) ^ (g & 1)  # clusters 2h apart in pairs
            rows += [(g * 10 + i, fp) for i in range(6)]
        from geomesa_spark.text.dedup import hamming_pairs
        out = [(r.a, r.b, r.hamming) for r in hamming_pairs(
            self._df(spark, rows), fp_col="fp", id_col="id",
            max_hamming=3).collect()]
        got = set(out)
        assert len(out) == len(got)  # no pair emitted twice
        want = set()
        for (ia, fa), (ib, fb) in itertools.combinations(rows, 2):
            h = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if h <= 3 and ia != ib:
                want.add((min(ia, ib), max(ia, ib), h))
        assert got == want
        assert any(h == 0 for _, _, h in got)  # in-group pairs present
        assert any(h > 0 for _, _, h in got)   # cross-group pairs present

    def test_chunk_count_validation(self, spark):
        import pytest as _pt
        from geomesa_spark.text.dedup import hamming_pairs
        df = self._df(spark, [(1, 5)])
        with _pt.raises(ValueError):
            hamming_pairs(df, fp_col="fp", id_col="id",
                          max_hamming=5, n_chunks=4)

    def test_simhash_pairs_unchanged(self, spark, docs):
        """The refactor onto hamming_pairs keeps simhash_pairs exact."""
        from geomesa_spark.text.dedup import simhash, simhash_pairs
        sig = {r.doc_id: r.simhash for r in simhash(docs).collect()}
        got = {(r.a, r.b) for r in simhash_pairs(docs).collect()}
        want = set()
        ids = sorted(sig)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    want.add((min(a, b), max(a, b)))
        assert got == want

    def test_phash_pairs_planted(self, spark):
        from geomesa_spark.operators.tiles import phash_pairs
        rows = [("a", 0x0123456789ABCDEF - (1 << 63)),
                ("a2", (0x0123456789ABCDEF - (1 << 63)) ^ 0b101),
                ("far", 0x7EDCBA9876543210)]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        got = [(r.a, r.b, r.hamming) for r in phash_pairs(
            df, max_hamming=3).collect()]
        assert got == [("a", "a2", 2)]


class TestPiiMask:
    """pii_mask: staged email -> IPv4 -> id-run masking with counts that
    equal the replacements each stage performs."""

    def _run(self, spark, texts):
        from geomesa_spark.text.analysis import pii_mask
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        return {r["doc_id"]: r for r in pii_mask(df).collect()}

    def test_masks_and_counts(self, spark):
        rows = self._run(spark, [
            "mail a.b@x.org and c@y.co.uk now",
            "host 10.0.0.1 and 192.168.255.254",
            "acct 123456789 ref 98765432100",
            "clean text, nothing to mask",
        ])
        assert rows[0]["n_emails"] == 2 and rows[0]["masked"] == \
            "mail <EMAIL> and <EMAIL> now"
        assert rows[1]["n_ips"] == 2 and rows[1]["masked"] == \
            "host <IP> and <IP>"
        assert rows[2]["n_idnums"] == 2 and rows[2]["masked"] == \
            "acct <ID> ref <ID>"
        r = rows[3]
        assert (r["n_emails"], r["n_ips"], r["n_idnums"]) == (0, 0, 0)
        assert r["masked"] == "clean text, nothing to mask"

    def test_staging_prevents_double_count(self, spark):
        # the email's digits must NOT count as an id-run (emails are
        # masked before the id stage sees the text); an id-run adjacent
        # to the email still counts once
        rows = self._run(spark, ["user1234567890@ex.com pin 555666777888"])
        r = rows[0]
        assert r["n_emails"] == 1
        assert r["n_idnums"] == 1
        assert r["masked"] == "<EMAIL> pin <ID>"

    def test_ip_not_recounted_as_idnum(self, spark):
        # IPv4 octets are masked before the id stage; short digit runs
        # survive unmasked
        rows = self._run(spark, ["ip 1.2.3.4 port 8080"])
        r = rows[0]
        assert r["n_ips"] == 1 and r["n_idnums"] == 0
        assert r["masked"] == "ip <IP> port 8080"


def test_url_host_stats(spark):
    """url_host_stats: extraction, host reduction, and both counts."""
    from geomesa_spark.text.analysis import url_host_stats
    df = spark.createDataFrame([
        (0, "see https://a.example.org/p/1 and https://a.example.org/q"),
        (1, "only http://b.example.net/x here"),
        (2, "again https://a.example.org/r"),
        (3, "no urls at all"),
    ], "doc_id long, text string")
    rows = {r["host"]: r for r in url_host_stats(df).collect()}
    assert set(rows) == {"a.example.org", "b.example.net"}
    assert rows["a.example.org"]["n_urls"] == 3
    assert rows["a.example.org"]["n_docs"] == 2
    assert rows["b.example.net"]["n_urls"] == 1
    assert rows["b.example.net"]["n_docs"] == 1
