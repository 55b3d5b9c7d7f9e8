"""Unit tests for the training-corpus assembly operators.

The DuckDB hash parity for each driver query lives in
test_driver_contract; these pin the kernel semantics on hand-built
inputs — pack-boundary rules, straddle math, leakage accounting,
sampling determinism, quantile interpolation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from scrapely_spark.spark import corpus


def _docs(spark, texts, langs=None):
    rows = [(i, t, (langs[i] if langs else "en"), "src0", len(t))
            for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


# ---------------------------------------------------------------- packing

def test_pack_greedy_boundary_rules(spark):
    # shard 0 only (doc_ids all multiples of 8 via n_shards=1)
    texts = [
        "a b c",            # 3 tokens -> pack 0 (acc 3)
        "d e",              # acc 5 <= 6 -> pack 0
        "f",                # acc 6 == max -> stays in pack 0 (<=, not <)
        "g h i j k l m",    # 7 tokens > 6 -> oversized, alone in pack 1
        "n o p q r s",      # 6 tokens -> exactly max, pack 2
        "t",                # would be 7 -> pack 3
    ]
    out = corpus.pack_greedy(_docs(spark, texts), max_tokens=6,
                             n_shards=1).collect()
    packs = {r.doc_id: r.pack_id for r in out}
    assert packs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3}
    # no pack except the oversized singleton exceeds max_tokens
    totals = {}
    for r in out:
        totals.setdefault(r.pack_id, []).append(r.n_tokens)
    for pid, toks in totals.items():
        assert sum(toks) <= 6 or len(toks) == 1


def test_pack_greedy_shards_are_independent(spark):
    texts = ["w x y z"] * 8                      # 4 tokens each
    out = corpus.pack_greedy(_docs(spark, texts), max_tokens=8,
                             n_shards=2).collect()
    # shard = doc_id % 2 -> 4 docs per shard, 2 per pack
    for r in out:
        assert r.shard == r.doc_id % 2
        assert r.pack_id == (r.doc_id // 2) // 2


def test_pack_chunks_straddle_math(spark):
    texts = ["a b c d", "e f g", "h i j k l"]    # 4, 3, 5 tokens
    out = {r.doc_id: r for r in
           corpus.pack_chunks(_docs(spark, texts), seq_len=4,
                              n_shards=1).collect()}
    # offsets 0, 4, 7; seq cut every 4 tokens
    assert (out[0].start_off, out[0].begin_seq, out[0].end_seq) == (0, 0, 0)
    assert (out[1].start_off, out[1].begin_seq, out[1].end_seq) == (4, 1, 1)
    # doc 2 spans tokens 7..11 -> sequences 1 and 2
    assert (out[2].start_off, out[2].begin_seq, out[2].end_seq) == (7, 1, 2)


def test_pack_chunks_offsets_are_contiguous_per_shard(spark):
    texts = ["one two three"] * 12
    rows = corpus.pack_chunks(_docs(spark, texts), seq_len=10,
                              n_shards=3).collect()
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        off = 0
        for r in docs:
            assert r.start_off == off
            off += r.n_tokens


# ---------------------------------------------------------- contamination

def test_contamination_full_and_zero_overlap(spark):
    leaked = "the quick brown fox jumps over the lazy dog"
    clean = "unique held out words never seen in train"
    texts = [""] * 59
    texts[0] = leaked                 # doc 0 -> test split (0 % 29 == 0)
    texts[29] = clean                 # doc 29 -> test split
    texts[1] = leaked                 # train copy of the leaked doc
    texts[2] = "totally different train text goes right here"
    docs = _docs(spark, texts).where("text <> ''")
    out = {r.doc_id: r for r in corpus.contamination(docs).collect()}
    assert out[0].contamination == 1.0
    assert out[0].n_train_docs == 1
    assert out[29].contamination == 0.0
    assert out[29].n_shared == 0
    # test docs never appear as train hits (split is disjoint)
    assert set(out) == {0, 29}


def test_contamination_short_test_doc_reports_zero_not_missing(spark):
    # a test doc with fewer words than the n-gram width has no grams,
    # but it was still EVALUATED: it must appear with an all-zero row
    # so output cardinality always equals the test-split cardinality
    texts = [""] * 59
    texts[0] = "only two"                       # test split, < 3 words
    texts[29] = "a long enough held out test document right here"
    texts[1] = "some train text with enough words to shingle fine"
    docs = _docs(spark, texts).where("text <> ''")
    out = {r.doc_id: r for r in corpus.contamination(docs).collect()}
    assert set(out) == {0, 29}
    assert (out[0].n_test_ngrams, out[0].n_train_docs,
            out[0].n_shared, out[0].contamination) == (0, 0, 0, 0.0)


def test_contamination_df_cap_drops_boilerplate(spark):
    # "of the and" appears in every train doc -> df above the cap -> not
    # counted as leakage for the test doc that also contains it
    texts = ["of the and"] * 8
    docs = _docs(spark, texts)       # doc 0 is test, 1..7 train
    out = corpus.contamination(docs, max_df=3).collect()
    assert len(out) == 1
    assert out[0].n_shared == 0 and out[0].contamination == 0.0


# --------------------------------------------------------------- sampling

def test_stratified_sample_matches_md5_rule(spark):
    texts = ["doc %d body" % i for i in range(64)]
    langs = ["en" if i % 2 else "de" for i in range(64)]
    rates = {"en": 0.7, "de": 0.2}
    out = corpus.stratified_sample(_docs(spark, texts, langs), rates,
                                   seed=7).collect()
    kept = {r.doc_id for r in out}
    for i in range(64):
        ticket = hashlib.md5(("%d:7" % i).encode()).hexdigest()[:8]
        expect = ticket < corpus.sample_threshold(rates[langs[i]])
        assert (i in kept) == expect
    # tickets surfaced verbatim for auditability
    for r in out:
        assert r.ticket == hashlib.md5(
            ("%d:7" % r.doc_id).encode()).hexdigest()[:8]


def test_stratified_sample_is_seed_sensitive_and_deterministic(spark):
    texts = ["word " * 3] * 50
    df = _docs(spark, texts)
    a = {r.doc_id for r in
         corpus.stratified_sample(df, {"en": 0.5}, seed=1).collect()}
    b = {r.doc_id for r in
         corpus.stratified_sample(df, {"en": 0.5}, seed=2).collect()}
    a2 = {r.doc_id for r in
          corpus.stratified_sample(df, {"en": 0.5}, seed=1).collect()}
    assert a == a2
    assert a != b


def test_sample_threshold_endpoints():
    assert corpus.sample_threshold(0.0) == "00000000"
    assert corpus.sample_threshold(1.0) == "ffffffff"
    assert corpus.sample_threshold(0.5) == "80000000"


# ------------------------------------------------------------- composition

def test_clean_corpus_applies_all_three_filters(spark):
    good = ("the quick brown fox and the lazy dog walk to the market "
            "in the morning and buy a basket of fresh bread for the "
            "family to share at noon " * 3)
    rows = [
        (0, good, "en"),          # keeper, en-agreeing, high quality
        (1, good, "en"),          # exact dup of 0 -> dropped (non-keeper)
        (2, "x", "en"),           # quality floor drops it
        (3, good, "zh"),          # langid says en, labeled zh -> dropped
    ]
    df = spark.createDataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = corpus.clean_corpus(df, min_quality=0.4).collect()
    assert [r.doc_id for r in out] == [0]
    assert out[0].lang == "en" and out[0].quality >= 0.4


# ------------------------------------------------------------ corpus stats

def test_top_ngrams_counts_occurrences_and_breaks_ties(spark):
    texts = ["b b b b", "a a a a"]    # "b b" x3, "a a" x3
    out = corpus.top_ngrams(_docs(spark, texts), n=2, k=2).collect()
    assert [(r.ngram, r.n_occurrences) for r in out] == [
        ("a a", 3), ("b b", 3)]      # tie -> lexicographic


def test_length_quantiles_linear_interpolation(spark):
    texts = ["w " * n for n in (1, 2, 3, 4)]    # 1..4 tokens... plus ''
    # "w " * n strip -> n tokens
    out = corpus.length_quantiles(_docs(spark, texts),
                                  qs=(0.5,)).collect()
    assert len(out) == 1
    lens = np.array([1, 2, 3, 4], dtype=float)
    assert out[0].p50 == pytest.approx(
        float(np.percentile(lens, 50)), abs=1e-9)
    assert out[0].n_docs == 4


# ------------------------------------------------------- weighted sample


def _es_twin(ids_weights, k, seed=0):
    """Pure-Python Efraimidis-Spirakis twin (same md5 ticket rule)."""
    import math
    keyed = []
    for doc_id, w in ids_weights:
        if w is None or w <= 0:
            continue
        h = int(hashlib.md5(
            ("%d:%d" % (doc_id, seed)).encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / 2.0 ** 48
        keyed.append((-math.log(u) / w, doc_id))
    return [d for _, d in sorted(keyed)[:k]]


def _wdocs(spark, ids_weights, langs=None):
    rows = [(i, float(w) if w is not None else None,
             (langs or {}).get(i, "en"))
            for i, w in ids_weights]
    return spark.createDataFrame(rows,
                                 "doc_id long, w double, lang string")


def test_weighted_sample_matches_twin(spark):
    iw = [(i, 0.1 + (i * 7 % 13)) for i in range(200)]
    got = sorted(r.doc_id for r in corpus.weighted_sample(
        _wdocs(spark, iw), 25, "w").collect())
    assert got == sorted(_es_twin(iw, 25))


def test_weighted_sample_heavy_rows_win(spark):
    # one row carries ~all the mass: it must be in any small sample
    iw = [(i, 1e-6) for i in range(100)] + [(100, 1e6)]
    got = {r.doc_id for r in corpus.weighted_sample(
        _wdocs(spark, iw), 5, "w").collect()}
    assert 100 in got


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    iw = [(0, 1.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)]
    got = {r.doc_id for r in corpus.weighted_sample(
        _wdocs(spark, iw), 10, "w").collect()}
    assert got == {0, 4}


def test_weighted_sample_seed_draws_independent_sample(spark):
    iw = [(i, 1.0) for i in range(300)]
    d = _wdocs(spark, iw)
    s0 = sorted(r.doc_id for r in corpus.weighted_sample(
        d, 30, "w", seed=0).collect())
    s0b = sorted(r.doc_id for r in corpus.weighted_sample(
        d, 30, "w", seed=0).collect())
    s1 = sorted(r.doc_id for r in corpus.weighted_sample(
        d, 30, "w", seed=1).collect())
    assert s0 == s0b
    assert s0 != s1
    assert s0 == sorted(_es_twin(iw, 30, seed=0))
    assert s1 == sorted(_es_twin(iw, 30, seed=1))


def test_weighted_sample_per_group_k(spark):
    iw = [(i, 1.0) for i in range(40)]
    langs = {i: ("en" if i % 2 else "de") for i in range(40)}
    out = corpus.weighted_sample(_wdocs(spark, iw, langs), 4, "w",
                                 group_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert sorted(by_lang) == ["de", "en"]
    assert all(len(v) == 4 for v in by_lang.values())
    # per-group winners == twin restricted to the group
    for lang, ids in by_lang.items():
        group = [(i, w) for i, w in iw if langs[i] == lang]
        assert sorted(ids) == sorted(_es_twin(group, 4))


# --------------------------------------------------------- PMI bigrams


def _pmi_twin(texts, k=50, min_count=5):
    import math
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.lower().strip().split()
        uni.update(ws)
        bi.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    rows = []
    for b, c_ab in bi.items():
        if c_ab < min_count:
            continue
        a, c = b.split(" ")
        pmi = math.log((c_ab / n_bi)
                       / ((uni[a] / n_uni) * (uni[c] / n_uni)))
        rows.append((round(pmi, 6), b, c_ab))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return [(b, c, p) for p, b, c in rows[:k]]


def test_top_pmi_bigrams_matches_twin(spark):
    import random
    rng = random.Random(3)
    vocab = ["spark", "join", "hash", "scan", "fast", "data"]
    texts = [" ".join(rng.choice(vocab) for _ in range(30))
             for _ in range(40)]
    # plant a true collocation: rare words that only occur together
    texts += ["prefix new york suffix"] * 6
    got = [(r.bigram, r.c_ab, r.pmi) for r in corpus.top_pmi_bigrams(
        _docs(spark, texts), k=20, min_count=5).collect()]
    assert got == _pmi_twin(texts, k=20, min_count=5)
    assert got[0][0] == "new york"  # the planted collocation tops PMI


def test_top_pmi_min_count_suppresses_hapax(spark):
    # a once-seen pair has huge PMI but must not surface
    texts = ["a b"] * 10 + ["rare pair"]
    got = [r.bigram for r in corpus.top_pmi_bigrams(
        _docs(spark, texts), k=10, min_count=2).collect()]
    assert "rare pair" not in got
    assert "a b" in got


# ----------------------------------------------------- repetition filters

def test_repetition_stats_hand_computed(spark):
    from scrapely_spark.spark import textstats
    texts = [
        "a b a b a b",        # 6 words, 2 distinct; "a b" bigram 3/5
        "x y z w",            # all distinct; every bigram unique (1/3)
        "solo",               # 1 word: no bigrams/trigrams -> 0.0
        "T t T",              # lowercased: 1 distinct; "t t" 2/2
    ]
    rows = {r.doc_id: r for r in textstats.repetition_stats(
        _docs(spark, texts)).collect()}
    r0 = rows[0]
    assert r0.n_words == 6
    assert r0.dup_word_frac == round(1 - 2 / 6, 6)
    assert r0.top_bigram_frac == 0.6          # 3 of 5 bigrams are "a b"
    assert r0.top_trigram_frac == 0.5         # 2 of 4 are "a b a"
    r1 = rows[1]
    assert r1.dup_word_frac == 0.0
    assert r1.top_bigram_frac == round(1 / 3, 6)
    r2 = rows[2]
    assert (r2.dup_word_frac, r2.top_bigram_frac, r2.top_trigram_frac) == \
        (0.0, 0.0, 0.0)
    r3 = rows[3]
    assert r3.dup_word_frac == round(1 - 1 / 3, 6)
    assert r3.top_bigram_frac == 1.0


def test_repetition_stats_random_twin(spark):
    # seeded random corpora vs the direct python definition (single
    # spaces only: whitespace-class edge semantics are pinned by the
    # DuckDB oracle parity in test_driver_contract, not here)
    import random
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "Ee"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
             for _ in range(60)]
    from scrapely_spark.spark import textstats
    got = {r.doc_id: r for r in
           textstats.repetition_stats(_docs(spark, texts)).collect()}
    for d, t in enumerate(texts):
        w = t.lower().split(" ")
        def top(n):
            grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
            if not grams:
                return 0.0
            return round(max(map(grams.count, set(grams))) / len(grams), 6)
        r = got[d]
        assert r.n_words == len(w)
        assert r.dup_word_frac == round(1 - len(set(w)) / len(w), 6)
        assert (r.top_bigram_frac, r.top_trigram_frac) == (top(2), top(3)), d


def test_redact_pii_counts_and_masking(spark):
    from scrapely_spark.spark import textstats
    texts = [
        "mail a@b.io and c.d+e@sub.domain.org today",     # 2 emails
        "server 10.0.0.1 peers with 192.168.7.255.",      # 2 IPs
        "call +44-207-9460000 or +1-555-0142 now",        # 2 phones
        "no pii at all in this one",
        "mixed: x@y.com via 8.8.8.8 at +1-555-9999",
    ]
    rows = {r.doc_id: r for r in textstats.redact_pii(
        _docs(spark, texts)).collect()}
    assert (rows[0].n_emails, rows[0].n_ipv4, rows[0].n_phones) == (2, 0, 0)
    assert rows[0].text_redacted == "mail <EMAIL> and <EMAIL> today"
    assert rows[1].n_ipv4 == 2
    assert rows[1].text_redacted == "server <IP> peers with <IP>."
    assert rows[2].n_phones == 2
    assert rows[2].text_redacted == "call <PHONE> or <PHONE> now"
    assert (rows[3].n_emails, rows[3].n_ipv4, rows[3].n_phones) == (0, 0, 0)
    assert rows[3].text_redacted == texts[3]
    assert rows[4].text_redacted == "mixed: <EMAIL> via <IP> at <PHONE>"


def test_scrub_corpus_composes_all_five_filters(spark):
    good = ("the quick brown fox and the lazy dog walk to the market "
            "in the morning and buy a basket of fresh bread for the "
            "family to share at noon " * 3)
    repetitive = "the spam " * 30          # en-agreeing, quality-passing
    rows = [
        (0, good + " ping admin@site.org", "en"),   # keeper -> masked
        (1, good + " ping admin@site.org", "en"),   # exact dup -> dropped
        (2, "x", "en"),                             # quality floor
        (3, good, "zh"),                            # langid disagrees
        (4, repetitive, "en"),                      # repetition thresholds
    ]
    df = spark.createDataFrame(
        [(i, t, l, "src0", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = corpus.scrub_corpus(df, min_quality=0.4,
                              max_dup_word_frac=0.8,
                              max_top_bigram_frac=0.2).collect()
    assert [r.doc_id for r in out] == [0]
    r = out[0]
    assert r.text_redacted.endswith("ping <EMAIL>")
    assert r.quality >= 0.4 and r.dup_word_frac <= 0.8


def test_mixing_rates_allocation_invariants(spark):
    # two sources, one clearly higher-quality: allocations are
    # proportional to quality mass, sum to the budget, and the rate
    # caps at 1.0 when a source's allocation exceeds its tokens
    rich = ("the quick brown fox and the lazy dog walk to the market "
            "in the morning to buy a basket of bread for the family ")
    poor = "zxq wvu tsr qpo nml"
    rows = [(i, rich, "en", "good", len(rich)) for i in range(8)]
    rows += [(100 + i, poor, "en", "bad", len(poor)) for i in range(8)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r.source: r for r in
           corpus.mixing_rates(df, budget_tokens=200).collect()}
    good, bad = out["good"], out["bad"]
    assert good.quality_mass > bad.quality_mass
    assert abs(good.alloc_tokens + bad.alloc_tokens - 200.0) < 0.01
    ratio = good.alloc_tokens / bad.alloc_tokens
    assert abs(ratio - good.quality_mass / bad.quality_mass) < 1e-3
    # the tiny source's allocation exceeds its 40 tokens -> rate caps
    assert bad.n_tokens == 40 and bad.rate == 1.0
    assert 0.0 < good.rate < 1.0


def test_pack_greedy_hot_shard_skew(spark):
    """One shard holding ~100× the documents: boundaries stay exact
    (first-fit scan reference) and the hot shard's boundary kernel
    stays O(shard) — the whole skewed run completes in seconds, far
    below what a per-row Python loop over the hot shard would cost."""
    import time

    n_shards = 8
    hot_docs, cold_docs = 40_000, 400   # shard 0 ≈ 100× shards 1..7
    rows = []
    did = 0
    # shard = doc_id % n_shards → control the residue class directly
    for i in range(hot_docs):
        rows.append((i * n_shards, "w " * ((i % 7) + 1)))
    for s in range(1, n_shards):
        for i in range(cold_docs):
            rows.append((i * n_shards + s, "w " * ((i % 7) + 1)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    t0 = time.time()
    got = corpus.pack_greedy(df, max_tokens=16, n_shards=n_shards) \
        .orderBy("doc_id").collect()
    wall = time.time() - t0
    # generous absolute bound: the boundary kernel packs the 40k-row hot
    # shard in well under a second; 60s catches an O(rows²) or
    # per-row-Python regression without being flaky on a loaded box
    assert wall < 60, wall

    # exactness: replay first-fit sequentially per shard
    by_shard: dict = {}
    for doc_id, text in sorted(rows):
        by_shard.setdefault(doc_id % n_shards, []).append(
            (doc_id, len(text.split())))
    want = {}
    for shard, docs in by_shard.items():
        acc, pid = 0, 0
        for doc_id, n_tok in docs:
            if acc and acc + n_tok > 16:
                pid, acc = pid + 1, 0
            acc += n_tok
            want[doc_id] = (shard, pid, n_tok)
    assert len(got) == len(want)
    for r in got:
        assert (r.shard, r.pack_id, r.n_tokens) == want[r.doc_id], r


# ------------------------------------------------- round-4 composition

def test_apply_mixing_rates_ticket_rule(spark):
    from pyspark.sql import functions as F
    rows = [(i, "src%d" % (i % 2), "some text here") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rates = spark.createDataFrame(
        [("src0", 1.0), ("src1", 0.25)], "source string, rate double")
    out = corpus.apply_mixing_rates(docs, rates, seed=42).collect()
    got = {r.doc_id for r in out}
    # src0 (rate >= 1.0): every doc survives
    assert all(i in got for i in range(0, 200, 2))
    # src1: survival iff first-8-hex md5 ticket < floor(0.25 * 2^32)
    thr = format(int(0.25 * 2 ** 32), "08x")
    for i in range(1, 200, 2):
        ticket = hashlib.md5(b"%d:42" % i).hexdigest()[:8]
        assert (i in got) == (ticket < thr), i
    # the joined rate column rides along
    assert {r.rate for r in out} == {1.0, 0.25}


def test_llm_corpus_build_invariants(spark):
    """Composition-level invariants on real testdata: unique packed
    docs, every packed doc is a canonical scrub survivor, and no pack
    overflows max_tokens unless it holds a single oversized doc."""
    from pyspark.sql import functions as F
    from scrapely_spark.spark import corpus as c, dedup
    import __spark_entry__ as contract
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(sf + "/documents.parquet")
    out = c.llm_corpus_build(
        docs, contract.ibl_extract_docs(spark, sf)).collect()
    assert out, "composition produced no rows"
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))

    # packed docs ⊆ scrub survivors of the dedup-canonical set
    clusters = dedup.dup_clusters(docs, dedup.minhash_candidates(docs))
    keepers = clusters.where("doc_id = canonical_doc_id").select("doc_id")
    scrub_ids = {r.doc_id for r in
                 c.scrub_corpus(docs.join(keepers, "doc_id"))
                 .select("doc_id").collect()}
    assert set(ids) <= scrub_ids

    # pack capacity rule per (shard, pack_id)
    packs: dict = {}
    for r in out:
        packs.setdefault((r.shard, r.pack_id), []).append(r.n_tokens)
    for key, toks in packs.items():
        if len(toks) > 1:
            assert sum(toks) <= 256, (key, toks)

    # caption matches the extraction-oracle closed form
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    import re as _re
    for r in out[:20]:
        want = _re.sub(r"\s+", " ", texts[r.doc_id][:48]).strip()
        assert r.caption == want


def test_length_quantiles_approx_envelope(spark):
    """The bench-only approx twin stays within a tight envelope of the
    exact quantiles (accuracy=10k on a small table is near-exact)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {r.lang: r for r in corpus.length_quantiles(docs).collect()}
    approx = {r.lang: r for r in
              corpus.length_quantiles(docs, approx=True).collect()}
    assert set(exact) == set(approx)
    for lang, e in exact.items():
        a = approx[lang]
        assert a.n_docs == e.n_docs
        for p in ("p25", "p50", "p75", "p90", "p99"):
            # approx_percentile returns an observed value; exact
            # interpolates between two — at most one observation apart
            assert abs(getattr(a, p) - getattr(e, p)) <= \
                max(2.0, 0.05 * getattr(e, p)), (lang, p)


def test_llm_corpus_build_empty_survivor_set(spark):
    """A corpus the scrub stack rejects entirely yields an empty packed
    set (not a crash): repetitive single-word docs fail the quality
    floor and the dup-word threshold."""
    import __spark_entry__  # noqa: F401  (env parity with the driver)
    rows = [(i, "spam " * 50, "en", "src0", 250) for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    extracted = spark.createDataFrame(
        [(i, "cap") for i in range(20)], "doc_id long, caption string")
    out = corpus.llm_corpus_build(docs, extracted)
    assert out.count() == 0


def test_temperature_rates_alpha_half_twin(spark):
    """α=½ temperature mix equals a plain-python computation and boosts
    the low-resource source above its proportional share."""
    import math
    rows = [(i, "w " * (200 if i < 40 else 10), "big" if i < 40 else "small")
            for i in range(50)]
    docs = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string")
    got = {r.source: r for r in
           corpus.temperature_rates(docs, budget_tokens=1000).collect()}
    n = {"big": 40 * 200, "small": 10 * 10}
    w = {s: round(math.sqrt(v) * 1e6) for s, v in n.items()}
    tot = sum(w.values())
    for s in n:
        alloc = 1000.0 * w[s] / tot
        assert got[s].n_tokens == n[s]
        assert abs(got[s].alloc_tokens - round(alloc, 4)) < 1e-9, s
        assert abs(got[s].rate - round(min(1.0, alloc / n[s]), 6)) < 1e-9
    # the boost: small's keep-rate beats proportional allocation
    prop_small = 1000.0 * n["small"] / (n["big"] + n["small"]) / n["small"]
    assert got["small"].rate > prop_small


# ------------------------------------------------------- global_shuffle

def test_global_shuffle_is_a_sharded_permutation(spark):
    import hashlib
    texts = ["doc %d" % i for i in range(80)]
    df = _docs(spark, texts)
    out = corpus.global_shuffle(df, n_shards=8, seed=0).collect()
    assert sorted(r.doc_id for r in out) == list(range(80))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        # pos is 1..len contiguous within the shard
        assert sorted(r.pos for r in rows) == list(range(1, len(rows) + 1))
        # pos order IS ticket order (the twin recomputes the ticket)
        tick = {r.doc_id: hashlib.md5(
            ("%d:0" % r.doc_id).encode()).hexdigest() for r in rows}
        want = sorted(rows, key=lambda r: (tick[r.doc_id], r.doc_id))
        got = sorted(rows, key=lambda r: r.pos)
        assert [r.doc_id for r in got] == [r.doc_id for r in want]
        # shard assignment matches the first-60-bit rule
        for r in rows:
            assert int(tick[r.doc_id][:15], 16) % 8 == shard


def test_global_shuffle_deterministic_and_seed_sensitive(spark):
    texts = ["doc %d" % i for i in range(50)]
    df = _docs(spark, texts)
    a = {(r.doc_id, r.shard, r.pos)
         for r in corpus.global_shuffle(df, 4, seed=1).collect()}
    b = {(r.doc_id, r.shard, r.pos)
         for r in corpus.global_shuffle(df.repartition(7), 4,
                                        seed=1).collect()}
    c = {(r.doc_id, r.shard, r.pos)
         for r in corpus.global_shuffle(df, 4, seed=2).collect()}
    assert a == b          # partitioning-invariant
    assert a != c          # a new seed draws a new epoch


# ----------------------------------------------------- unimax_allocation

def _unimax_twin(tok_by_source, budget, max_epochs):
    eps = int(round(max_epochs * 1e6))
    bm = budget * 1_000_000
    items = sorted((n * eps, s, n) for s, n in tok_by_source.items())
    n_src = len(items)
    pre = 0
    cands = []
    for k, (cap, _, _) in enumerate(items):
        cands.append(float(bm - pre) / float(n_src - k))
        pre += cap
    level = max(cands)
    return {s: (min(float(cap), level) / 1e6,
                (min(float(cap), level) / 1e6) / float(n))
            for cap, s, n in items}


def test_unimax_allocation_matches_twin_and_caps_bind(spark):
    # sources sized so the smallest two hit their epoch caps
    texts, srcs = [], []
    sizes = {"sa": 4, "sb": 7, "sc": 40, "sd": 60}
    for s, n_words in sizes.items():
        texts.append(" ".join("w%d" % i for i in range(n_words)))
        srcs.append(s)
    rows = [(i, t, "en", srcs[i], len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r.source: (r.alloc_tokens, r.epochs)
           for r in corpus.unimax_allocation(df, budget_tokens=100,
                                             max_epochs=2.0).collect()}
    want = _unimax_twin(sizes, 100, 2.0)
    assert out == want
    # caps bind exactly for the small sources
    assert out["sa"] == (8.0, 2.0) and out["sb"] == (14.0, 2.0)
    # the rest share the remaining 78 tokens at one uniform level
    assert abs(out["sc"][0] - 39.0) < 1e-9
    assert abs(out["sd"][0] - 39.0) < 1e-9
    assert abs(sum(a for a, _ in out.values()) - 100.0) < 1e-9


def test_unimax_allocation_budget_exceeds_all_caps(spark):
    rows = [(0, "a b c", "en", "s1", 5), (1, "d e", "en", "s2", 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r.source: (r.alloc_tokens, r.epochs)
           for r in corpus.unimax_allocation(df, budget_tokens=1000,
                                             max_epochs=3.0).collect()}
    # every source fully capped at max_epochs
    assert out == {"s1": (9.0, 3.0), "s2": (6.0, 3.0)}


def test_shard_manifest_invariants(spark):
    import hashlib

    rows = [(i, "doc text %d é" % i) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.shard: r for r in
           corpus.shard_manifest(df, n_shards=8, seed=0).collect()}
    # twin: same ticket, same 32-bit slice sum, BYTE lengths
    twin = {}
    for i, t in rows:
        tk = hashlib.md5(("%d:0" % i).encode()).hexdigest()
        s = int(tk[:15], 16) % 8
        n, b, c = twin.get(s, (0, 0, 0))
        twin[s] = (n + 1, b + len(t.encode()),
                   c + int(hashlib.md5(t.encode()).hexdigest()[:8], 16))
    assert set(got) == set(twin)
    for s, (n, b, c) in twin.items():
        assert (got[s].n_docs, got[s].n_bytes, got[s].checksum) == (n, b, c)
    # tamper detection: one flipped doc moves exactly its shard's sum
    rows2 = [(i, t if i != 7 else t + "!") for i, t in rows]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = {r.shard: r for r in
            corpus.shard_manifest(df2, n_shards=8, seed=0).collect()}
    s7 = int(hashlib.md5(b"7:0").hexdigest()[:15], 16) % 8
    diff = [s for s in got if (got[s].checksum, got[s].n_bytes)
            != (got2[s].checksum, got2[s].n_bytes)]
    assert diff == [s7]


def test_shard_manifest_partitioning_invariance(spark):
    rows = [(i, "t%d" % (i * 13)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, corpus.shard_manifest(df, 8).collect()))
    b = sorted(map(tuple,
                   corpus.shard_manifest(df.repartition(32), 8).collect()))
    assert a == b


def test_pmi_single_word_docs_keep_their_unigrams(spark):
    """A 1-word document has no bigrams but its unigram still counts
    toward n_uni and c_a/c_b — concat with a NULL ngram array must
    not null out the whole tagged stream (regression: fused scan)."""
    from scrapely_spark.spark.corpus import top_pmi_bigrams

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta alpha beta alpha beta alpha "
             "beta alpha beta"),
         (2, "beta"), (3, "beta"), (4, "beta"), (5, "beta")],
        "doc_id long, text string")
    out = {r["bigram"]: r
           for r in top_pmi_bigrams(docs, k=5, min_count=5).collect()}
    assert "alpha beta" in out
    # PMI must reflect the four single-word 'beta' docs in c_b/n_uni:
    # c_ab=6, n_bi=11, c_a=6, c_b=10 (6 in doc1 + 4 singles), n_uni=16
    import math
    want = math.log((6 / 11) / ((6 / 16) * (10 / 16)))
    assert abs(out["alpha beta"]["pmi"] - round(want, 6)) < 1e-9


def test_empty_and_null_docs_never_crash_the_pipeline(spark):
    """Spark 4's default ANSI mode turns x/0 into a job-killing
    exception: one empty extraction must score low, not crash
    quality_scores (and with it clean/scrub/llm_corpus_build), and a
    NULL text must pack as 0 tokens, not NaN-crash the pandas kernel."""
    from pyspark.sql import functions as F

    from scrapely_spark.spark import textstats

    docs = spark.createDataFrame(
        [(0, "a normal document with several words", "en", "src0", 36),
         (1, "", "en", "src0", 0),
         (2, None, "en", "src0", 0),
         (3, "   ", "en", "src0", 3)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    q = {r.doc_id: r for r in textstats.quality_scores(docs).collect()}
    assert len(q) == 4
    assert q[1].punct_ratio == 0.0 and q[1].alpha_ratio == 0.0
    assert q[0].quality > q[1].quality

    greedy = {r.doc_id: r for r in
              corpus.pack_greedy(docs, max_tokens=8,
                                 n_shards=1).collect()}
    assert greedy[2].n_tokens == 0
    chunks = {r.doc_id: r for r in
              corpus.pack_chunks(docs, seq_len=8,
                                 n_shards=1).collect()}
    assert chunks[2].n_tokens == 0
    assert chunks[2].start_off is not None

    # the statistics operators drop the '' phantom token entirely
    pmi = corpus.top_pmi_bigrams(
        docs.where("text IS NOT NULL"), k=5, min_count=1).collect()
    assert all("''" not in r.bigram for r in pmi)


def test_stratified_sample_rate_one_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en", "src0", 1) for i in range(500)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = corpus.stratified_sample(docs, {"en": 1.0}, seed=3)
    assert out.count() == 500
