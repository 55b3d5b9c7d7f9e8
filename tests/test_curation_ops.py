"""Kernel-semantics tests for the round-4 curation operators.

DuckDB hash parity lives in test_driver_contract; these pin the math
on hand-built inputs against independent pure-Python twins:
lm_perplexity (CCNet bigram-LM bucketing), dsir_weights (hashed-ngram
importance resampling), aspect_buckets (SDXL ladder assignment).
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from scrapely_spark.spark import corpus, multimodal, textstats


def _r(x, n):
    """Spark/DuckDB-style HALF_UP rounding of the exact double value
    (Python's round() is banker's and disagrees at .5 boundaries)."""
    return float(Decimal(x).quantize(Decimal("1e-%d" % n),
                                     rounding=ROUND_HALF_UP))


def _docs(spark, rows):
    # rows: (doc_id, text, lang, source)
    return spark.createDataFrame(
        [(i, t, lg, src, len(t)) for i, t, lg, src in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


# ------------------------------------------------------- lm_perplexity

def _ppl_twin(rows):
    """Independent bigram-LM twin: add-one smoothing, micro-nat model
    rounding, exact integer per-doc sums — the operator's contract."""
    toks = {i: t.strip().lower().split() for i, t, _, _ in rows}
    uni, bi = {}, {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    lp = {g: round(math.log((c + 1.0) / (uni[g[0]] + v)) * 1e6)
          for g, c in bi.items()}
    out = {}
    for i, ws in toks.items():
        grams = list(zip(ws, ws[1:]))
        if not grams:
            continue
        s = sum(lp[g] for g in grams)
        out[i] = (-(s / 1e6) / len(grams), len(grams))
    return out


def test_lm_perplexity_matches_python_twin(spark):
    rows = [
        (0, "a b a b a b", "en", "s0"),          # repetitive -> low ppl
        (1, "a b c d e f g", "en", "s0"),        # all-hapax -> high ppl
        (2, "a b a c a b a", "en", "s0"),
        (3, "x y x y z", "de", "s1"),
        (4, "solo", "en", "s0"),                 # no bigram -> dropped
    ]
    got = {r.doc_id: r for r in
           textstats.lm_perplexity(_docs(spark, rows)).collect()}
    twin = _ppl_twin(rows)
    assert set(got) == set(twin) == {0, 1, 2, 3}
    for i, (nll, n) in twin.items():
        assert got[i].n_bigrams == n
        assert got[i].avg_nll == nll            # raw double, bit-equal
        assert abs(got[i].ppl - _r(math.exp(nll), 4)) < 1e-9
    # per-language ntile on (avg_nll, doc_id): en has 3 scored docs ->
    # one per bucket, ordered by ascending nll; de's single doc is head
    en = sorted((twin[i][0], i) for i in (0, 1, 2))
    order = {got[i].bucket: i for i in (0, 1, 2)}
    assert [order["head"], order["middle"], order["tail"]] == [
        i for _, i in en]
    assert got[3].bucket == "head"


def test_lm_perplexity_repetition_scores_lower(spark):
    rows = [(0, "a b a b a b a b", "en", "s"),
            (1, "q w e r t y u i", "en", "s")]
    got = {r.doc_id: r for r in
           textstats.lm_perplexity(_docs(spark, rows)).collect()}
    assert got[0].ppl < got[1].ppl
    assert got[0].bucket == "head" and got[1].bucket != "head"


# -------------------------------------------------------- dsir_weights

def _bucket(word, n=256):
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n


def _dsir_twin(rows, target, n=256):
    toks = {i: t.strip().lower().split() for i, t, _, _ in rows}
    raw, tgt = {}, {}
    for i, t, _, src in rows:
        for w in toks[i]:
            b = _bucket(w, n)
            raw[b] = raw.get(b, 0) + 1
            if src == target:
                tgt[b] = tgt.get(b, 0) + 1
    n_raw, n_tgt = sum(raw.values()), sum(tgt.values())
    lr = {b: round(math.log(((tgt.get(b, 0) + 1.0) / (n_tgt + n))
                            / ((c + 1.0) / (n_raw + n))) * 1e6)
          for b, c in raw.items()}
    return {i: sum(lr[_bucket(w, n)] for w in toks[i]) / 1e6
            for i in toks}


def test_dsir_weights_match_python_twin(spark):
    rows = [
        (0, "wiki wiki encyclopedia article", "en", "target"),
        (1, "spam casino pills spam spam", "en", "web"),
        (2, "wiki article mixed casino", "en", "web"),
    ]
    got = {r.doc_id: r for r in
           corpus.dsir_weights(_docs(spark, rows), "target").collect()}
    twin = _dsir_twin(rows, "target")
    for i, w in twin.items():
        assert abs(got[i].log_weight - _r(w, 6)) < 1e-9
        assert got[i].n_words == len(rows[i][1].split())
    # target-vocabulary doc outranks the spam doc
    assert got[0].log_weight > got[1].log_weight
    assert got[1].log_weight < got[2].log_weight < got[0].log_weight


def test_dsir_weight_is_partitioning_invariant(spark):
    rows = [(i, "w%d common target word" % (i % 7), "en",
             "target" if i % 3 == 0 else "web") for i in range(40)]
    df = _docs(spark, rows)
    a = {r.doc_id: r.log_weight
         for r in corpus.dsir_weights(df, "target").collect()}
    b = {r.doc_id: r.log_weight
         for r in corpus.dsir_weights(df.repartition(13), "target")
         .collect()}
    assert a == b


# ------------------------------------------------------ aspect_buckets

def test_aspect_buckets_known_assignments(spark):
    imgs = spark.createDataFrame(
        [("sq", 512, 512), ("land", 1600, 900), ("port", 900, 1600),
         ("wide", 2048, 1024), ("tallish", 800, 1200)],
        "image_id string, w int, h int")
    got = {r.image_id: r for r in
           multimodal.aspect_buckets(imgs).collect()}
    assert got["sq"].bucket == "1:1" and got["sq"].target_w == 1024
    assert got["land"].bucket == "16:9"
    assert got["port"].bucket == "9:16"
    assert got["wide"].bucket == "2:1" and got["wide"].target_h == 704
    assert got["tallish"].bucket == "2:3"


def test_aspect_buckets_tie_goes_to_earlier_ladder_entry(spark):
    # an aspect exactly midway between 1:1 (1.0) and 4:3 (1.3333..)
    # has equal |diff| to neither in doubles; instead pin the exact-hit
    # tie rule: a ratio equal to a ladder entry picks that entry even
    # if a later entry computes the same diff
    ladder = [("a", 100, 100), ("b", 200, 200)]  # identical ratios
    imgs = spark.createDataFrame([("x", 50, 50)],
                                 "image_id string, w int, h int")
    got = multimodal.aspect_buckets(imgs, ladder=ladder).collect()[0]
    assert got.bucket == "a" and got.target_w == 100


def test_aspect_buckets_twin_over_grid(spark):
    dims = [(w, h) for w in (32, 333, 704, 1025) for h in (64, 500, 999)]
    imgs = spark.createDataFrame(
        [("%dx%d" % d, d[0], d[1]) for d in dims],
        "image_id string, w int, h int")
    got = {r.image_id: r.bucket for r in
           multimodal.aspect_buckets(imgs).collect()}
    for w, h in dims:
        ar = w / h
        diffs = [abs(ar - bw / bh) for _, bw, bh in
                 multimodal.ASPECT_LADDER]
        best = min(range(len(diffs)), key=lambda i: (diffs[i], i))
        assert got["%dx%d" % (w, h)] == multimodal.ASPECT_LADDER[best][0]


def test_lm_perplexity_approx_buckets_envelope(spark):
    # the approx-thresholds scale path agrees with the exact ntile on
    # scores and keeps bucket sizes balanced; with accuracy 10k on a
    # small input percentile_approx is exact, so boundary rules aside
    # the assignments match the sorted thirds
    rows = [(i, " ".join("w%d" % ((i * 7 + j) % 23)
                         for j in range(12)), "en", "s")
            for i in range(60)]
    exact = {r.doc_id: r for r in
             textstats.lm_perplexity(_docs(spark, rows)).collect()}
    approx = {r.doc_id: r for r in
              textstats.lm_perplexity(_docs(spark, rows),
                                      approx_thresholds=True).collect()}
    assert set(exact) == set(approx)
    for i in exact:
        assert exact[i].avg_nll == approx[i].avg_nll  # same scoring
    sizes = {}
    for r in approx.values():
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert set(sizes) == {"head", "middle", "tail"}
    assert all(10 <= n <= 30 for n in sizes.values())
    # ordering invariant: every head score <= every tail score
    heads = [approx[i].avg_nll for i in approx
             if approx[i].bucket == "head"]
    tails = [approx[i].avg_nll for i in approx
             if approx[i].bucket == "tail"]
    assert max(heads) <= min(tails)


# ----------------------------------------------------------- bpe_train

def _bpe_twin(texts, n_merges):
    """Independent pure-Python BPE trainer: same vocabulary weighting,
    greedy left-to-right merge application, lexicographic tie-break."""
    vocab = {}
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[w]
        if not counts:
            break
        (x, y), support = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y, support))
        for w, syms in segs.items():
            out, prev = [], ""
            for s in syms:
                if prev == x and s == y:
                    out.append(x + y)
                    prev = ""
                else:
                    if prev:
                        out.append(prev)
                    prev = s
            if prev:
                out.append(prev)
            segs[w] = out
    return merges, segs


def test_bpe_train_matches_python_twin(spark):
    texts = ["low lower lowest low low newer new",
             "low newer newest wider wide new"]
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    merges, vocab = corpus.bpe_train(_docs(spark, rows), n_merges=6)
    twin_merges, twin_segs = _bpe_twin(texts, 6)
    assert merges == twin_merges
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == twin_segs
    # the classic suffix factorization falls out
    assert got["lower"] == ["low", "er"] and got["newest"][0] == "new"


def test_bpe_train_partitioning_invariant(spark):
    import random
    rng = random.Random(11)
    texts = [" ".join(rng.choice(["alpha", "alps", "alto", "beta",
                                  "betas", "bet", "gamma"])
                      for _ in range(20)) for _ in range(12)]
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    df = _docs(spark, rows)
    m1, _ = corpus.bpe_train(df, n_merges=5)
    m2, _ = corpus.bpe_train(df.repartition(7), n_merges=5)
    assert m1 == m2 == _bpe_twin(texts, 5)[0]


def test_bpe_train_inplan_path_matches_driver_path(spark):
    # driver_max_words=0 forces the in-plan executor loop; default
    # forces the driver fast path — both must equal the twin bit-for-bit
    import random
    rng = random.Random(23)
    texts = [" ".join(rng.choice(["stream", "streams", "stride",
                                  "string", "strong", "str", "ring"])
                      for _ in range(15)) for _ in range(10)]
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    df = _docs(spark, rows)
    m_driver, v_driver = corpus.bpe_train(df, n_merges=5)
    m_inplan, v_inplan = corpus.bpe_train(df, n_merges=5,
                                          driver_max_words=0)
    assert m_driver == m_inplan == _bpe_twin(texts, 5)[0]
    got_d = {r.word: list(r.syms) for r in v_driver.collect()}
    got_i = {r.word: list(r.syms) for r in v_inplan.collect()}
    assert got_d == got_i


def test_bpe_tokenize_counts_matches_twin(spark):
    texts = ["low lower lowest low low newer new",
             "low newer newest wider wide new"]
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    got = {r.doc_id: (r.n_words, r.bpe_tokens)
           for r in corpus.bpe_tokenize_counts(
               _docs(spark, rows), n_merges=6).collect()}
    _, segs = _bpe_twin(texts, 6)
    want = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.strip().lower().split() if w]
        want[i] = (len(ws), sum(len(segs[w]) for w in ws))
    assert got == want


def test_bpe_tokenize_counts_oov_char_fallback(spark):
    # cap the training vocabulary to 2 word types: every other word is
    # out-of-vocabulary and must count as character-level tokens
    texts = ["aa aa aa bb bb zzz"]
    rows = [(0, texts[0], "en", "s")]
    got = corpus.bpe_tokenize_counts(
        _docs(spark, rows), n_merges=2, max_vocab_words=2).collect()
    assert len(got) == 1
    r = got[0]
    # vocab = {aa, bb}; merges fuse both into single tokens; zzz is OOV
    # and falls back to its 3 characters
    assert (r.n_words, r.bpe_tokens) == (6, 5 + 3)


def test_bpe_merge_application_overlapping_runs(spark):
    # re.sub semantics on a run: [a a a a] + merge (a,a) -> [aa aa],
    # never the overlapping [aa, a, a]-then-[aa, aa, ...] confusion
    rows = [(0, "aaaa aaa", "en", "s")]
    merges, vocab = corpus.bpe_train(_docs(spark, rows), n_merges=1)
    assert merges[0][:2] == ("a", "a")
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_bpe_merge_table_shape(spark):
    rows = [(0, "low lower low", "en", "s")]
    out = corpus.bpe_merge_table(_docs(spark, rows), n_merges=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert all(r.merged == r.x + r.y and r.support >= 1 for r in out)


# ------------------------------------------- quality_classifier (r4)

def _qc_twin(text, n_buckets=1024):
    """Independent twin of the hashed bag-of-words linear classifier:
    bucket = md5-48bit(token) % n_buckets, weight = md5-48bit('w:'+
    bucket) % 2001 - 1000, raw = exact integer sum."""
    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
    words = __import__("re").split(r"\s+", text.strip().lower())
    raw = 0
    for t in words:
        b = h48(t) % n_buckets
        raw += h48("w:%d" % b) % 2001 - 1000
    return len(words), raw


def test_quality_classifier_matches_python_twin(spark):
    rows = [(0, "the quick brown fox", "en", "s"),
            (1, "THE  Quick\tbrown FOX", "en", "s"),
            (2, "zzz", "en", "s"),
            (3, "alpha beta gamma delta epsilon zeta", "en", "s")]
    got = {r.doc_id: r for r in
           textstats.quality_classifier(_docs(spark, rows)).collect()}
    for i, t, _, _ in rows:
        n, raw = _qc_twin(t)
        r = got[i]
        assert (r.n_tokens, r.raw_score) == (n, raw), (i, t)
        # integer micro grid with truncation toward zero (SQL div):
        # int() in Python truncates toward zero too
        assert r.score == int(raw * 1000 / n) / 1e6
        assert r.keep == (raw >= 0)


def test_quality_classifier_case_and_whitespace_invariant(spark):
    # lowering + \s+ split: case and interior whitespace cannot move
    # the score
    rows = [(0, "Hello World", "en", "s"),
            (1, "  hello   \t world  ", "en", "s")]
    got = {r.doc_id: (r.n_tokens, r.raw_score) for r in
           textstats.quality_classifier(_docs(spark, rows)).collect()}
    assert got[0] == got[1]


# ------------------------------------------------- c4_filters (r4)

def test_c4_filters_each_rule_bites(spark):
    rows = [
        # keeps: 3 punctuated >=5-word lines
        (0, "one two three four five.\nsix seven eight nine ten!\n"
            "a b c d e?", "en", "s"),
        # line rules: short line + unpunctuated line stripped, one
        # survivor -> fails min_sentences
        (1, "tiny line.\nthis has five words here\n"
            "good line with five words.", "en", "s"),
        # lorem page: structurally fine but dropped
        (2, "one two three four five.\nsix seven eight nine ten.\n"
            "lorem ipsum dolor sit amet.", "en", "s"),
        # brace page: dropped
        (3, "one two three four five.\nsix seven eight nine ten.\n"
            "if (x) { return 1; } else quit now.", "en", "s"),
        # everything stripped -> keep false, empty clean text
        (4, "no punct here at all\nshort.", "en", "s"),
    ]
    got = {r.doc_id: r for r in
           textstats.c4_filters(_docs(spark, rows)).collect()}
    assert got[0].keep and got[0].n_lines_kept == 3
    assert got[0].n_sentences == 3
    assert not got[1].keep and got[1].n_lines_kept == 1
    assert not got[2].keep and got[2].has_lorem
    assert not got[3].keep and got[3].has_brace
    assert not got[4].keep and got[4].n_lines_kept == 0
    assert got[4].text_clean == ""
    # the quote-terminated line rule: C4 keeps dialogue lines
    rows2 = [(9, 'he said "this is five words."', "en", "s")]
    r9 = textstats.c4_filters(_docs(spark, rows2)).collect()[0]
    assert r9.n_lines_kept == 1


# --------------------------------------------- encoding_gate (r4)

def test_encoding_gate_counts_each_damage_class(spark):
    rows = [
        (0, "perfectly clean ascii text here", "en", "s"),
        (1, "cafÃ© is mojibake for café", "en", "s"),
        (2, "lost bytes �� here", "en", "s"),
        (3, "bell\x07 and escape\x1b chars", "en", "s"),
        (4, "tabs\tand\nnewlines are NOT control damage", "en", "s"),
        (5, "aéb real accents are fine", "en", "s"),
    ]
    got = {r.doc_id: r for r in
           textstats.encoding_gate(_docs(spark, rows)).collect()}
    assert got[0].keep
    assert got[1].n_mojibake == 1 and not got[1].keep
    assert got[2].n_replacement == 2 and not got[2].keep
    assert got[3].n_control == 2 and not got[3].keep
    assert got[4].keep  # \t \n \r are whitespace, not damage
    assert got[5].keep  # properly-decoded accents pass
    assert got[0].n_chars == len(rows[0][1])


# -------------------------------------------- host_quality (r4)

def test_host_quality_micro_grid_rollup(spark):
    rows = [(0, "alpha beta", "en", "s"), (1, "gamma", "en", "s"),
            (2, "delta epsilon zeta", "en", "s")]
    hosts = {0: "a", 1: "a", 2: "b"}
    df = spark.createDataFrame(
        [(i, hosts[i], t) for i, t, _, _ in rows],
        "doc_id long, host string, text string")
    got = {r.host: r for r in textstats.host_quality(df).collect()}

    # independent twin: per-doc micro scores then integer host means
    def micro(text):
        n, raw = _qc_twin(text)
        q = abs(raw * 1000) // n
        m = q if raw >= 0 else -q  # div truncates toward zero
        return n, raw, m
    per = {i: micro(t) for i, t, _, _ in rows}
    for h in ("a", "b"):
        ids = [i for i in hosts if hosts[i] == h]
        n_docs = len(ids)
        n_keep = sum(1 for i in ids if per[i][1] >= 0)
        sm = sum(per[i][2] for i in ids)
        r = got[h]
        assert (r.n_docs, r.n_keep) == (n_docs, n_keep)
        assert r.keep_rate_micro == (n_keep * 1_000_000) // n_docs
        want_mean = (abs(sm) // n_docs) * (1 if sm >= 0 else -1)
        assert r.mean_score_micro == want_mean, h


def test_host_quality_partitioning_invariance(spark):
    rows = [(i, "h%d" % (i % 3), "tok%d word%d x" % (i, i * 7))
            for i in range(60)]
    df1 = spark.createDataFrame(rows, "doc_id long, host string, text string")
    r1 = sorted(map(tuple, textstats.host_quality(df1).collect()))
    r2 = sorted(map(tuple,
                    textstats.host_quality(df1.repartition(32)).collect()))
    assert r1 == r2
