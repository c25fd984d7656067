"""html -> text extraction: the byte-identical invariant at the source."""

from __future__ import annotations

from pyspark.sql import functions as F

from spartan2_spark.datagen import synth_pages
from spartan2_spark.operators.text import extract_text


def test_extract_text_roundtrips_synth_pages_byte_identically(spark):
    pages = synth_pages(spark, 2000, n_urls=40, days=2)
    out = extract_text(pages)
    bad = out.filter(
        F.sha2(F.col("extracted_text"), 256) != F.sha2(F.col("text"), 256)
    ).count()
    assert bad == 0


def test_extract_text_strips_blocks_tags_and_entities(spark):
    html = (
        "<html><head><style>p{color:red}</style>"
        "<script>var a = '<p>not text</p>';</script></head>"
        "<!-- a comment with <tags> inside -->"
        "<body><p>A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;</p>"
        "<div>second</div></body></html>"
    )
    df = spark.createDataFrame([("u", html.encode())], "url string, html binary")
    got = extract_text(df).select("extracted_text").first()[0]
    assert got == "A & B <ok> \"q\" 's'second"
    # double-escaped entity decodes one level only (&amp; applied last)
    df2 = spark.createDataFrame(
        [("u", b"<p>&amp;lt;</p>")], "url string, html binary"
    )
    assert extract_text(df2).first()["extracted_text"] == "&lt;"


def test_corpus_cross_entropy_ranks_odd_docs(spark):
    from spartan2_spark.operators.text import corpus_cross_entropy

    rows = [(i, "the cat sat on the mat") for i in range(9)]
    rows.append((99, "zyx wvu tsr qpo nml kji"))  # all-rare tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["cross_entropy_bits"] for r in corpus_cross_entropy(df).collect()}
    # the odd doc's tokens each appear once -> maximal cross-entropy
    assert out[99] > out[0]
    assert all(out[i] == out[0] for i in range(9))


def test_tfidf_top_terms_distinctive(spark):
    from spartan2_spark.operators.text import tfidf_top_terms

    rows = [
        (1, "common common rareword"),
        (2, "common common other"),
        (3, "common filler text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r["token"] for r in tfidf_top_terms(df, k=2).collect()}
    # 'rareword' (df=1) beats 'common' (df=3) for doc 1
    assert out[(1, 1)] == "rareword"
    assert out[(1, 2)] == "common"


def test_zipf_slope_and_hapax_planted(spark):
    from spartan2_spark.operators.text import vocab_hapax, zipf_slope

    # geometric frequencies: freq(rank r) = 2^(4-r) for ranks 1..4 ->
    # ln f = ln 16 - r ln 2: NOT linear in ln r, but monotone; slope
    # must be negative and finite. Exact hapax accounting is the
    # sharper assertion below.
    words = (["aa"] * 16) + (["bb"] * 8) + (["cc"] * 4) + (["dd"] * 2) + ["ee"]
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    z = zipf_slope(df, top_n=10).collect()[0]
    assert z.n_terms == 5 and z.slope < -1.0
    h = vocab_hapax(df).collect()[0]
    assert h.n_vocab == 5 and h.n_tokens == 31 and h.n_hapax == 1
    assert h.ttr == round(5 / 31, 8) and h.hapax_frac == 0.2


def test_pmi_collocations_planted(spark):
    import math

    from spartan2_spark.operators.text import pmi_collocations

    # "new york" always adjacent (strong collocation); "the cat" and
    # "the dog" mix freely with a shared left word (weak)
    docs = [(i, "new york " + ("the cat " if i % 2 else "the dog ") * 3)
            for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.gram: r for r in pmi_collocations(df, min_count=5).collect()}
    assert "new york" in out and out["new york"].c_xy == 10
    # exact PMI for "new york": p(xy)=10/B, p(new)=p(york)=10/N
    n_uni = 10 * 8  # 8 tokens per doc
    n_big = sum(r.c_xy for r in out.values())
    expect = math.log((10 / n_big) / ((10 / n_uni) * (10 / n_uni)))
    assert abs(out["new york"].pmi - expect) < 1e-6
    # the perfectly-bound pair out-scores the promiscuous "the *" pairs
    assert out["new york"].pmi > out["the cat"].pmi


def test_doc_entropy_planted(spark):
    import math

    from spartan2_spark.operators.text import doc_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    got = {r.id: r for r in doc_entropy(df).collect()}
    assert got[1].entropy_nats == 0.0           # one token repeated
    assert abs(got[2].entropy_nats - math.log(4)) < 1e-7  # uniform over 4
    assert abs(got[3].entropy_nats - math.log(2)) < 1e-7  # uniform over 2


def test_boilerplate_detect_and_strip_byte_identity(spark):
    """Planted site: shared nav/footer lines on every page around
    unique content. Detection flags exactly the shared lines (the
    50%-of-docs integer cross-multiply), and stripping recovers each
    page's ORIGINAL content bytes — including interior blank lines and
    leading whitespace on kept lines."""
    import pandas as pd

    from spartan2_spark.operators.text import (
        boilerplate_lines,
        boilerplate_strip,
    )

    content = {
        1: "unique article one\n\n  indented quote kept as-is",
        2: "second article body",
        3: "third article body",
    }
    rows = [
        ("site", i, f"NAV | MENU\n{c}\nCopyright site")
        for i, c in content.items()
    ]
    # a 1-doc group: min_docs=2 must keep ALL its lines
    rows.append(("solo", 9, "NAV | MENU\nsolo content\nCopyright solo"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "text"])
    )
    flags = boilerplate_lines(df).toPandas()
    site_boiler = set(
        flags[(flags.grp == "site") & (flags.is_boiler == 1)].line
    )
    assert site_boiler == {"NAV | MENU", "Copyright site"}
    assert (flags[flags.grp == "solo"].is_boiler == 0).all()

    out = {
        r.id: r.text_clean for r in boilerplate_strip(df).collect()
    }
    for i, c in content.items():
        assert out[i] == c, f"doc {i} bytes not recovered"
    # solo group untouched
    assert out[9] == "NAV | MENU\nsolo content\nCopyright solo"


def test_outlink_domain_graph_hand_pages(spark):
    from spartan2_spark.operators.text import outlink_domain_graph

    pages = spark.createDataFrame(
        [
            (
                "https://a.example/p1",
                '<a href="https://b.example/x">1</a>'
                '<a href="https://b.example/y?q=2#frag">2</a>'
                '<a href="/relative">3</a>'
                '<a href="https://a.example/self">4</a>',
            ),
            ("https://b.example/p2", '<a href="http://c.example">5</a>'),
            ("https://c.example/p3", "no links here"),
        ],
        "url string, html string",
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in outlink_domain_graph(pages).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,  # multiplicity collapses map-side
        ("a.example", "a.example"): 1,  # self-loop kept
        ("b.example", "c.example"): 1,  # http scheme matches too
    }


def test_phrase_match_positions_and_overlaps(spark):
    """Planted phrases: 1-based positions, repeated and overlapping
    occurrences counted, case-folded, non-matching docs absent."""
    import pandas as pd

    from spartan2_spark.operators.text import phrase_match

    rows = [
        (1, "Hash Join beats sort merge when hash join fits memory"),
        (2, "go go go"),          # overlapping occurrences of "go go"
        (3, "no occurrences here"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.id: r for r in phrase_match(df, ["hash", "join"]).collect()}
    assert set(out) == {1}
    assert out[1].n_hits == 2 and out[1].first_pos == 1

    out2 = {r.id: r for r in phrase_match(df, ["go", "go"]).collect()}
    assert out2[2].n_hits == 2 and out2[2].first_pos == 1  # pos 1 and 2


def test_ngram_novelty_two_day_split(spark):
    """Day 0 introduces all its grams (ratio 1.0); day 1 repeats one
    doc verbatim and adds one new doc — novelty counts only the
    globally-new grams."""
    import pandas as pd

    from spartan2_spark.operators.text import ngram_novelty

    rows = [
        (0, "a b c d"),        # grams: "a b c", "b c d"
        (1, "a b c d"),        # same grams again -> not novel
        (1, "x y z w"),        # grams: "x y z", "y z w" -> novel
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["day", "text"]))
    out = {r.day: r for r in ngram_novelty(df, n=3).collect()}
    assert out[0].distinct_grams == 2 and out[0].novel_grams == 2
    assert out[0].novelty_ratio == 1.0
    assert out[1].distinct_grams == 4 and out[1].novel_grams == 2
    assert out[1].novelty_ratio == 0.5


def test_bm25_ranking_hand_case(spark):
    """BM25 orders docs by term relevance: the doc with more query-term
    hits and shorter length outranks the longer one; docs without any
    query term are absent; IDF favors the rarer term."""
    import pandas as pd

    from spartan2_spark.operators.text import bm25_scores

    rows = [
        (1, "hash join hash join"),            # tf(hash)=2 tf(join)=2, short
        (2, "hash " + "filler " * 50),          # tf(hash)=1, long
        (3, "sort merge only"),                 # no query terms
        (4, "join"),                            # rare-term doc
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = bm25_scores(df, ["hash", "join"], top_k=10).collect()
    ids = [r.id for r in out]
    assert 3 not in ids
    assert ids[0] == 1                       # both terms, high tf, short
    assert out[0].n_terms_hit == 2
    by_id = {r.id: r for r in out}
    assert by_id[2].n_terms_hit == 1 and by_id[4].n_terms_hit == 1
    # doc 2 is 51 tokens of mostly filler — length normalization must
    # push it below the one-word doc 4
    assert by_id[4].score_q > by_id[2].score_q


def test_url_template_trap_detection(spark):
    """A digit-parameterized template aggregates its urls; distinct
    literal urls below min_urls are dropped."""
    import pandas as pd

    from spartan2_spark.operators.text import url_template_stats

    rows = [(u,) for u in (
        "a.com/day/1", "a.com/day/2", "a.com/day/3", "a.com/day/1",
        "b.com/about",
    )]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url"]))
    out = {r.template: r for r in url_template_stats(df, min_urls=2).collect()}
    assert set(out) == {"a.com/day/N"}
    t = out["a.com/day/N"]
    assert t.fetches == 4 and t.distinct_urls == 3
    assert t.example_url == "a.com/day/1" and t.max_depth == 3


def test_readability_known_text(spark):
    """Hand-counted sentence: 9 words, 2 sentences (clamped >= 1 for
    the fragment doc), vowel-run syllables; Flesch/FK reproduce the
    formula on the exact counts."""
    import pandas as pd

    from spartan2_spark.operators.text import readability_scores

    t1 = "The quick brown fox jumps over the lazy dog. It sleeps!"
    # words: The quick brown fox jumps over the lazy dog It sleeps = 11
    # vowel runs: e,ui,o,o,u,o,e,e,a,o,I,ee = count below
    t2 = "no punctuation fragment"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [t1, t2]})
    )
    out = {r.doc_id: r for r in readability_scores(df).collect()}
    r1 = out[1]
    assert r1.words == 11 and r1.sentences == 2
    import re
    syl = len(re.findall(r"[aeiouy]+", t1.lower()))
    assert r1.syllables == syl
    want = 206.835 - 1.015 * (11 / 2) - 84.6 * (syl / 11)
    assert abs(r1.flesch - want) < 1e-9
    r2 = out[2]
    assert r2.sentences == 1  # clamped
    assert r2.words == 3
    # empty-word doc -> NULL scores
    df0 = spark.createDataFrame(pd.DataFrame({"doc_id": [3], "text": ["123 456"]}))
    r3 = readability_scores(df0).collect()[0]
    assert r3.words == 0 and r3.flesch is None and r3.fk_grade is None


def test_source_vocab_overlap_exact_jaccard(spark):
    """Hand-built vocab sets: Jaccard from inclusion-exclusion,
    tokens case-folded and split on non-alphanumerics."""
    import pandas as pd

    from spartan2_spark.operators.text import source_vocab_overlap

    docs = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s3"],
        "text": ["Alpha beta GAMMA", "beta delta", "alpha beta xi",
                 "omega!!"],
    })
    out = {(r.src_a, r.src_b): r
           for r in source_vocab_overlap(spark.createDataFrame(docs)).collect()}
    # s1 = {alpha,beta,gamma,delta}, s2 = {alpha,beta,xi}: inter 2, union 5
    r = out[("s1", "s2")]
    assert (r.n_a, r.n_b, r.inter, r.union_n) == (4, 3, 2, 5)
    assert abs(r.jaccard - 2 / 5) < 1e-15
    # s3 shares nothing -> pair absent (min_shared = 1)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_oov_rate_exact(spark):
    """Vocab = top-1 token by (df, tf, token): 'the' wins; per-source
    OOV occurrence ppm computed by hand."""
    import pandas as pd

    from spartan2_spark.operators.text import oov_rate

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s1", "s1", "s2"],
        "text": ["the cat the dog", "the fish", "bird the"],
    })
    out = {r.source: r for r in
           oov_rate(spark.createDataFrame(docs), vocab_k=1).collect()}
    # 'the' df=3: the only vocab entry
    # s1: tokens 6, oov = cat,dog,fish = 3 -> 500000 ppm
    assert out["s1"].n_tokens == 6 and out["s1"].n_oov == 3
    assert out["s1"].oov_ppm == 500_000
    # s2: tokens 2, oov = bird -> 500000 ppm
    assert out["s2"].n_tokens == 2 and out["s2"].n_oov == 1


def test_packing_plan_lower_bound(spark):
    """ceil(total/ctx) vs the over-half count: the binding constraint
    flips depending on the length mix."""
    import pandas as pd

    from spartan2_spark.operators.text import packing_plan

    # ctx 100: three docs of 60 (> ctx/2 -> pairwise exclusive) but
    # total 180 -> ceil 2; bound must be 3 (over_half wins)
    d1 = pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [60, 60, 60]})
    r1 = packing_plan(spark.createDataFrame(d1), ctx_len=100).collect()[0]
    assert r1.bins_lower_bound == 3 and r1.n_truncated == 0
    # ctx 100: many small docs, total 450 -> ceil 5 wins; one doc of
    # 120 is truncated
    d2 = pd.DataFrame({"doc_id": range(12),
                       "n_chars": [30] * 11 + [120]})
    rows = packing_plan(spark.createDataFrame(d2), ctx_len=100).collect()
    r2 = rows[0]
    assert r2.total_tokens == 450 and r2.bins_lower_bound == 5
    assert r2.n_truncated == 1
    # bucket census is exact: 30 -> bucket 5 (bin len of 11110), 11 docs
    buckets = {r.bucket: r for r in rows}
    assert buckets[5].docs == 11 and buckets[5].tokens == 330


def test_filter_funnel_first_fail_charging(spark):
    """A doc failing stages 1 AND 2 charges only stage 1; stage 2's
    entered excludes it; ppm is exact floor."""
    import pandas as pd

    from spartan2_spark.operators.text import filter_funnel

    flags = spark.createDataFrame(pd.DataFrame({
        "a": [1, 1, 0, 0, 0, 0],
        "b": [1, 0, 1, 0, 0, 0],
    }))
    out = {r.stage: r for r in filter_funnel(
        flags, [("A", F.col("a") == 1), ("B", F.col("b") == 1)]).collect()}
    # docs 1,2 fail A (doc 1 also fails B but charges A)
    assert out["A"].entered == 6 and out["A"].failed == 2
    assert out["A"].surviving == 4
    assert out["A"].fail_ppm == 2 * 1_000_000 // 6
    # B sees only the 4 A-survivors; doc 3 fails it
    assert out["B"].entered == 4 and out["B"].failed == 1
    assert out["B"].surviving == 3


def test_lm_perplexity_discriminates_and_is_exact(spark):
    """CCNet-style char-LM perplexity: reference-like text scores lower
    ppl than alien text under a model trained on the reference; short
    docs emit NULL ppl with n_grams=0; quantized sums make re-runs
    bit-identical."""
    from spartan2_spark.operators.text import char_lm_counts, lm_perplexity

    ref_rows = [(i, "the quick brown fox jumps over the lazy dog " * 3)
                for i in range(20)]
    probe_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "zzqx jvwq xqzj wqvz qxzj vqwz zjxq wzqv qqxz"),
        (102, "ab"),  # shorter than n=3
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    probe = spark.createDataFrame(probe_rows, "doc_id long, text string")
    model = char_lm_counts(ref, "text", n=3)
    out = {r.id: r for r in lm_perplexity(probe, model, "text", "doc_id", 3).collect()}
    assert out[100].ppl < out[101].ppl
    assert out[102].n_grams == 0 and out[102].ppl is None
    out2 = {r.id: r for r in lm_perplexity(probe, model, "text", "doc_id", 3).collect()}
    assert all(out[k].nll_q == out2[k].nll_q for k in (100, 101))

    import pytest

    with pytest.raises(ValueError):
        char_lm_counts(ref, "text", n=1)
