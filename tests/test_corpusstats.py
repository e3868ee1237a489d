import math

import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from newscrawler_ray.pipelines import corpusstats


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_dup_span_planted(ray_session, tmp_path):
    """A planted 8-word span shared by two docs is flagged in both; a
    span repeated twice INSIDE one doc also counts (corpus total >= 2);
    short docs get zero spans."""
    span = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        f"lead one two {span} tail three",          # shares span with doc 1
        f"other start {span} different ending here",
        f"{span} filler {span}",                    # self-repeat
        "unique words only nothing shared at all among these tokens",
        "short doc",                                # < 8 words -> 0 spans
    ]
    d = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in corpusstats.dup_span_docs(d).take_all()}
    assert len(out) == 5
    assert out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0
    # docs 0 and 1 each contain the planted 8-gram exactly once
    assert out[0]["dup_spans"] >= 1
    assert out[1]["dup_spans"] >= 1
    # doc 2: the repeated span's both occurrences are duplicated
    assert out[2]["dup_spans"] >= 2
    assert out[3]["dup_spans"] == 0
    for i, t in enumerate(texts):
        n_words = len([w for w in t.split() if w])
        assert out[i]["n_spans"] == max(n_words - 7, 0)
        assert out[i]["dup_span_frac"] == round(
            out[i]["dup_spans"] / max(out[i]["n_spans"], 1) + 1e-9, 4
        )


def test_dup_span_brute_force(ray_session, tmp_path):
    """dup_spans matches a Python dict brute force over word 8-grams."""
    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)).tolist())
        for _ in range(40)
    ]
    d = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in corpusstats.dup_span_docs(d).take_all()}
    from collections import Counter
    k = 8
    grams_of = {}
    counts = Counter()
    for i, t in enumerate(texts):
        ws = t.split()
        gs = [tuple(ws[j:j + k]) for j in range(max(len(ws) - k + 1, 0))]
        grams_of[i] = gs
        counts.update(gs)
    for i in range(len(texts)):
        dup = sum(1 for g in grams_of[i] if counts[g] >= 2)
        assert out[i]["dup_spans"] == dup, i
        assert out[i]["n_spans"] == len(grams_of[i])


def test_tfidf_top_terms_brute_force(ray_session, tmp_path):
    """tfidf_top_terms matches a pure-Python TF-IDF on a toy corpus,
    including rounded-score ties broken by term ascending."""
    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple date date date egg",
        "fig fig fig fig fig",
    ]
    d = _write_docs(tmp_path, texts)
    rows = corpusstats.tfidf_top_terms(d, top_k=3).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["score"])
        )
    from collections import Counter
    n = float(len(texts))
    df = Counter()
    tfs = []
    for t in texts:
        c = Counter(t.split())
        tfs.append(c)
        df.update(c.keys())
    for i, c in enumerate(tfs):
        scored = sorted(
            (
                (term, tf, df[term],
                 round(tf * math.log(n / df[term]) + 1e-9, 4))
                for term, tf in c.items()
            ),
            key=lambda x: (-x[3], x[0]),
        )[:3]
        want = sorted(scored)
        have = sorted(got[i])
        assert have == want, (i, have, want)


def test_benchmark_contamination_planted(ray_session, tmp_path):
    """Docs sharing a k-gram with the benchmark slice are flagged; the
    benchmark docs themselves are excluded from the output."""
    span = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [None] * 10
    texts[0] = f"benchmark doc holds {span} and more trailing words"  # bench
    texts[5] = f"training doc leaks {span} right here"  # contaminated
    for i in range(10):
        if texts[i] is None:
            texts[i] = f"clean doc number {i} with its own distinct words x{i} y{i} z{i}"
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: r
        for r in corpusstats.benchmark_contamination_docs(
            d, k=8, bench_mod=5
        ).take_all()
    }
    # bench slice = doc_id % 5 == 0 -> docs 0 and 5 excluded
    assert set(out) == {1, 2, 3, 4, 6, 7, 8, 9}
    # doc 5 is benchmark (excluded); plant the leak in a non-bench doc too
    texts2 = list(texts)
    texts2[7] = f"another training doc repeats {span} verbatim"
    d2 = _write_docs(tmp_path, texts2)
    out2 = {
        r["doc_id"]: r
        for r in corpusstats.benchmark_contamination_docs(
            d2, k=8, bench_mod=5
        ).take_all()
    }
    assert out2[7]["contaminated"] == 1 and out2[7]["n_hits"] >= 1
    assert all(
        out2[i]["contaminated"] == 0 for i in (1, 2, 3, 4, 6, 8, 9)
    )


def test_corpus_ops_at_high_partition_counts(ray_session):
    """Regression guard (round-2 lesson): hash-shuffle/join stages emit
    0-column blocks for empty partitions once partition count exceeds
    the data, which acero rejects — run both shuffle-bearing ops at 16
    partitions on the tiny fixture where most partitions ARE empty."""
    sf = "/root/testdata/sf0.001"
    out = corpusstats.tfidf_top_terms(sf, num_partitions=16).take_all()
    assert len(out) == 500 * 5
    out2 = corpusstats.dup_span_docs(sf, num_partitions=16).take_all()
    assert len(out2) == 500
    out3 = corpusstats.strip_dup_spans(sf, num_partitions=16).take_all()
    assert len(out3) == 500


def test_unigram_logprob_brute_force(ray_session, tmp_path):
    """mean_nll matches a pure-Python unigram LM, including empty and
    single-word docs."""
    texts = [
        "",
        "rare",
        "common common common common",
        "common rare mixed words here",
        "common common mixed",
    ]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: r
        for r in corpusstats.unigram_logprob_docs(d).take_all()
    }
    from collections import Counter
    all_words = [w for t in texts for w in t.split()]
    c = Counter(all_words)
    total = float(len(all_words))
    for i, t in enumerate(texts):
        ws = t.split()
        want = round(
            sum(math.log(total / c[w]) for w in ws) / max(len(ws), 1)
            + 1e-9, 4,
        )
        assert out[i]["n_words"] == len(ws)
        assert out[i]["mean_nll"] == want, (i, out[i]["mean_nll"], want)
    # rare-word doc scores strictly higher than the all-common doc
    assert out[1]["mean_nll"] > out[2]["mean_nll"]


def test_bigram_logprob_brute_force(ray_session, tmp_path):
    """Bigram mean_nll = first-word unigram term + conditional bigram
    terms, vs a pure-Python model — empty, single-word, and repeated-
    bigram docs included."""
    texts = [
        "",
        "solo",
        "a b a b a b",
        "a b c d",
        "b a d c",
    ]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: r for r in corpusstats.bigram_logprob_docs(d).take_all()
    }
    from collections import Counter
    all_words = [w for t in texts for w in t.split()]
    uni = Counter(all_words)
    total = float(len(all_words))
    bi = Counter(
        (a, b) for t in texts for a, b in zip(t.split(), t.split()[1:])
    )
    for i, t in enumerate(texts):
        ws = t.split()
        nll = math.log(total / uni[ws[0]]) if ws else 0.0
        nll += sum(
            math.log(uni[a] / bi[(a, b)]) for a, b in zip(ws, ws[1:])
        )
        want = round(nll / max(len(ws), 1) + 1e-9, 4)
        assert out[i]["n_words"] == len(ws)
        assert out[i]["mean_nll"] == want, (i, out[i]["mean_nll"], want)
    # the common a-b chain scores lower than the unseen-order d-c doc
    assert out[2]["mean_nll"] < out[4]["mean_nll"]


def test_bigram_model_count1_drop_is_exact(ray_session, tmp_path):
    """Every bigram in this corpus is count-1, so the broadcast model is
    EMPTY after the exact count-1 drop — scoring must still produce the
    true NLL (the lookup fallback count 1.0 IS the true count)."""
    texts = ["p q r", "s t u", "v w"]
    d = _write_docs(tmp_path, texts)
    out = {
        r["doc_id"]: r for r in corpusstats.bigram_logprob_docs(d).take_all()
    }
    from collections import Counter
    all_words = [w for t in texts for w in t.split()]
    uni = Counter(all_words)
    total = float(len(all_words))
    for i, t in enumerate(texts):
        ws = t.split()
        nll = math.log(total / uni[ws[0]])
        nll += sum(math.log(uni[a] / 1.0) for a, b in zip(ws, ws[1:]))
        want = round(nll / max(len(ws), 1) + 1e-9, 4)
        assert out[i]["mean_nll"] == want, (i, out[i]["mean_nll"], want)


def test_curate_text_corpus_consistent_with_components(ray_session):
    """The composition's survivors pass every individual gate, as
    reported by the standalone operators on the same corpus."""
    sf = "/root/testdata/sf0.01"
    surv = {r["doc_id"] for r in corpusstats.curate_text_corpus(sf).take_all()}
    assert len(surv) > 0
    from newscrawler_ray.pipelines import dedup, textstats

    gopher = {
        r["doc_id"]: r["keep"]
        for r in textstats.gopher_repetition(sf).take_all()
    }
    quality = {
        r["doc_id"]: r["quality"] for r in textstats.quality_score(sf).take_all()
    }
    nll = {
        r["doc_id"]: r["mean_nll"]
        for r in corpusstats.unigram_logprob_docs(sf).take_all()
    }
    contam = {
        r["doc_id"]: r["contaminated"]
        for r in corpusstats.benchmark_contamination_docs(
            sf, k=4, bench_mod=31
        ).take_all()
    }
    dedup_winners = {r["doc_id"] for r in dedup.exact_dedup_docs(sf).take_all()}
    for d in surv:
        assert gopher[d] == 1, d
        assert quality[d] >= 0.55, d
        assert nll[d] <= 3.402, d
        assert d in contam and contam[d] == 0, d  # non-bench + clean
    # dedup among survivors: no two survivors share a text, and each is
    # the min doc_id of its text group within the gate-passing set
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    assert len({text_of[d] for d in surv}) == len(surv)
    passing = {
        d for d in gopher
        if gopher[d] == 1 and quality[d] >= 0.55 and nll[d] <= 3.402
        and contam.get(d) == 0
    }
    by_text: dict = {}
    for d in passing:
        by_text.setdefault(text_of[d], []).append(d)
    assert surv == {min(ds) for ds in by_text.values()}
    del dedup_winners  # full-corpus winners are a different (stricter) set


def test_dup_span_planted_at_10x(ray_session, tmp_path):
    """Scale regression (pattern of test_minhash_verify_is_distributed_
    at_10x): 20k docs, a chain-planted shared 8-gram across every
    1000th doc — the flagged set must be exactly the planted chain
    (plus nothing), and the run must finish in bounded time."""
    rng = np.random.default_rng(11)
    vocab = [f"w{c:04d}" for c in range(4000)]  # big vocab: no natural dups
    n = 20000
    texts = [
        " ".join(vocab[w] for w in rng.integers(0, 4000, int(rng.integers(20, 60))))
        for _ in range(n)
    ]
    for i in range(1000, n, 1000):
        src = texts[i - 1000].split()[:8]   # chains back to doc 0's prefix
        dst = texts[i].split()
        texts[i] = " ".join(src + dst[8:])
    d = _write_docs(tmp_path, texts)
    out = corpusstats.dup_span_docs(d).take_all()
    flagged = {r["doc_id"] for r in out if r["dup_spans"] > 0}
    assert flagged == set(range(0, n, 1000)), flagged ^ set(range(0, n, 1000))
    assert len(out) == n


def test_strip_dup_spans_brute_force(ray_session, tmp_path):
    """clean_text matches a per-doc Python recompute: drop every word
    position covered by any corpus-duplicated 8-gram window."""
    span = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        f"one two {span} three four five six seven",
        f"unrelated prefix {span} and a different suffix here",
        "totally unique document with no shared windows at all present",
        "short",
    ]
    d = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in corpusstats.strip_dup_spans(d).take_all()}
    from collections import Counter
    k = 8
    counts = Counter()
    grams_of = {}
    for i, t in enumerate(texts):
        ws = t.lower().split()
        gs = [tuple(ws[j:j + k]) for j in range(max(len(ws) - k + 1, 0))]
        grams_of[i] = (ws, gs)
        counts.update(gs)
    for i in range(len(texts)):
        ws, gs = grams_of[i]
        covered = [False] * len(ws)
        for j, g in enumerate(gs):
            if counts[g] >= 2:
                for p in range(j, j + k):
                    covered[p] = True
        want = " ".join(w for w, c in zip(ws, covered) if not c)
        assert out[i]["clean_text"] == want, i
        assert out[i]["n_removed"] == sum(covered), i
        assert out[i]["n_words"] == len(ws), i


def test_domain_quality_filter_gates_whole_domains(ray_session):
    """The gate drops whole domains: surviving sources all clear the
    mean-length bar, at least one domain is dropped on this corpus, and
    no partial domains appear (every doc of a surviving source stays)."""
    import duckdb

    from newscrawler_ray.pipelines.corpusstats import (
        domain_quality_filter,
        domain_stats,
    )

    sf = "/root/testdata/sf0.01"
    stats = domain_stats(sf).to_pandas().set_index("source")
    kept = domain_quality_filter(sf).to_pandas()
    kept_sources = set(kept["source"])
    all_sources = set(stats.index)
    assert kept_sources < all_sources  # at least one domain dropped
    for s in kept_sources:
        assert stats.loc[s, "avg_chars"] >= 280.0
    for s in all_sources - kept_sources:
        assert stats.loc[s, "avg_chars"] < 280.0
    per_source_total = duckdb.sql(
        f"SELECT source, count(*) n FROM read_parquet('{sf}/documents.parquet') GROUP BY source"
    ).fetchdf().set_index("source")["n"]
    counts = kept.groupby("source").size()
    for s in kept_sources:
        assert counts[s] == per_source_total[s]


def test_dsir_select_favors_target_lang(ray_session):
    """Importance resampling must enrich the target language: the
    selected top-100 carries a higher 'en' fraction than the corpus
    base rate, and weights come back sorted (desc, doc_id tiebreak)."""
    import duckdb

    from newscrawler_ray.pipelines.corpusstats import dsir_select

    sf = "/root/testdata/sf0.01"
    sel = dsir_select(sf).to_pandas()
    assert len(sel) == 100
    w = sel["weight"].tolist()
    assert w == sorted(w, reverse=True)
    langs = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{sf}/documents.parquet')"
    ).fetchdf().set_index("doc_id")["lang"]
    frac_sel = (langs.loc[sel["doc_id"]] == "en").mean()
    base = (langs == "en").mean()
    assert frac_sel > base + 0.1, (frac_sel, base)


def test_export_training_shards_resumable(ray_session, tmp_path):
    """Sharded export: all docs land exactly once across shards; a rerun
    skips every finished shard; a deleted shard (simulated crash) is
    rewritten byte-identically while the others stay skipped."""
    import shutil

    import pyarrow.parquet as pqt

    from newscrawler_ray.pipelines.corpusstats import (
        curate_text_corpus,
        export_training_shards,
    )

    sf = "/root/testdata/sf0.01"
    out = tmp_path / "shards"
    m1 = export_training_shards(sf, out, n_shards=4).to_pylist()
    assert all(not m["skipped"] for m in m1)
    want_ids = sorted(curate_text_corpus(sf).to_pandas()["doc_id"])
    got_ids = sorted(
        pqt.read_table(out).column("doc_id").to_pylist()
    )
    assert got_ids == want_ids

    m2 = export_training_shards(sf, out, n_shards=4).to_pylist()
    assert all(m["skipped"] for m in m2)

    victim = out / "shard=0002"
    before = pqt.read_table(victim).sort_by("doc_id")
    shutil.rmtree(victim)
    m3 = {m["shard"]: m for m in export_training_shards(sf, out, n_shards=4).to_pylist()}
    assert not m3[2]["skipped"] and all(m3[s]["skipped"] for s in (0, 1, 3))
    after = pqt.read_table(victim).sort_by("doc_id")
    assert before.equals(after)


def test_term_index_search_matches_scan(ray_session, tmp_path):
    """Index-backed search == scan search row-for-row for several
    keyword sets; a term absent from the corpus returns nothing; the
    index build is resumable (rerun skips all buckets)."""
    import duckdb

    from newscrawler_ray.pipelines.index import build_term_index, search_index

    sf = "/root/testdata/sf0.01"
    idx = tmp_path / "idx"
    m1 = build_term_index(sf, idx, n_buckets=8).to_pylist()
    assert all(not m["skipped"] for m in m1)
    m2 = build_term_index(sf, idx, n_buckets=8).to_pylist()
    assert all(m["skipped"] for m in m2)

    # bucket count comes from the index's _meta.json — a conflicting
    # rebuild and a search against a dir with no index both fail loudly
    with pytest.raises(ValueError, match="n_buckets"):
        build_term_index(sf, idx, n_buckets=16)
    with pytest.raises(ValueError, match="no term index"):
        search_index(tmp_path / "nowhere", sf, words=("spark",))

    for words in [("spark", "merge"), ("window",), ("spark", "merge", "the")]:
        got = sorted(
            search_index(idx, sf, words=words)
            .to_pandas()["doc_id"].tolist()
        )
        cond = " AND ".join(
            f"regexp_matches(text, '(?i)\\b{w}\\b')" for w in words
        )
        want = sorted(
            r[0]
            for r in duckdb.sql(
                f"""SELECT doc_id FROM read_parquet('{sf}/documents.parquet')
                    WHERE {cond} AND n_chars >= 100"""
            ).fetchall()
        )
        assert got == want, words
    none = search_index(idx, sf, words=("zzzqqqxyzzy",))
    assert none.count() == 0
    assert none.schema().base_schema.field("n_chars").type == pa.int64()


def test_term_index_multitoken_word(ray_session, tmp_path):
    """A query word that tokenizes to several tokens ('spark merge')
    prunes on the token intersection and the regex verify enforces
    adjacency — identical to the scan search, not silently empty."""
    import duckdb

    from newscrawler_ray.pipelines.index import build_term_index, search_index

    sf = "/root/testdata/sf0.01"
    idx = tmp_path / "idx"
    build_term_index(sf, idx, n_buckets=8)
    got = sorted(
        search_index(idx, sf, words=("spark merge",))
        .to_pandas()["doc_id"].tolist()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""SELECT doc_id FROM read_parquet('{sf}/documents.parquet')
                WHERE regexp_matches(text, '(?i)\\bspark merge\\b')
                  AND n_chars >= 100"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_source_overlap_matrix_planted(ray_session, tmp_path):
    """Planted cross-source near-dups: srcA doc 0 ~ srcB doc 1 (one word
    changed), srcB docs 2/3 identical (intra-source row), the rest
    random word salad -> exactly two matrix rows with the right counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines.corpusstats import source_overlap_matrix

    rng = np.random.default_rng(21)
    vocab = [f"v{i}" for i in range(300)]
    base = " ".join(rng.choice(vocab, size=40))
    near = base.replace(base.split()[5], "zzz")
    texts = [base, near, "copy cat " + base, "copy cat " + base]
    srcs = ["srcA", "srcB", "srcB", "srcB"]
    for _ in range(20):
        texts.append(" ".join(rng.choice(vocab, size=40)))
        srcs.append("srcC")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts), "source": pa.array(srcs)}
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in source_overlap_matrix(
            str(tmp_path), threshold=0.5, num_partitions=4
        ).take_all()
    }
    assert got[("srcA", "srcB")] >= 1  # the planted cross-source pair
    assert got[("srcB", "srcB")] >= 1  # the intra-source exact copies
    assert all(a != "srcC" and b != "srcC" for a, b in got)


def test_paragraph_dedup_keep_first(ray_session, tmp_path):
    """Keep-first semantics: the corpus-order first copy of a duplicated
    block SURVIVES (unlike strip_dup_spans, which removes every copy);
    later copies are stripped; remainder blocks (< k words) dedup too."""
    blk = "alpha beta gamma delta"          # one exact k=4 block
    texts = [
        f"{blk} one two three four",        # doc 0: blocks [blk, 'one two three four']
        f"{blk} five six seven eight",      # doc 1: duplicate of blk at bidx 0
        f"nine ten eleven twelve {blk}",    # doc 2: duplicate of blk at bidx 1
        "lone tail",                        # doc 3: one remainder block
        "lone tail",                        # doc 4: duplicate remainder block
    ]
    d = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in
           corpusstats.paragraph_dedup_docs(d, k=4).take_all()}
    assert len(out) == 5
    # doc 0 wins the block (lowest doc_id): nothing stripped
    assert out[0]["n_dropped"] == 0
    assert out[0]["clean_text"] == f"{blk} one two three four"
    # docs 1 and 2 lose their copy of blk, keep the rest
    assert out[1]["n_dropped"] == 1
    assert out[1]["clean_text"] == "five six seven eight"
    assert out[2]["n_dropped"] == 1
    assert out[2]["clean_text"] == "nine ten eleven twelve"
    # remainder blocks (< k words) participate: doc 3 wins, doc 4 drops
    assert out[3]["n_dropped"] == 0 and out[3]["clean_text"] == "lone tail"
    assert out[4]["n_dropped"] == 1 and out[4]["clean_text"] == ""
    # block accounting: ceil(n_words / k)
    assert out[0]["n_blocks"] == 2 and out[3]["n_blocks"] == 1


def test_bigram_ttr_planted(ray_session, tmp_path):
    """A spun-content source recombining one phrase scores a low TTR;
    an all-distinct source scores 1.0; bigrams never cross docs."""
    from newscrawler_ray.pipelines.corpusstats import bigram_ttr_by_source

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "red fox red fox red fox",   # bigrams: rf,fr,rf,fr,rf
                    "red fox red fox",           # rf, fr, rf
                    "one two three four",        # all distinct
                    "five six seven",            # all distinct
                ],
                pa.string(),
            ),
            "source": pa.array(["spun", "spun", "fresh", "fresh"]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {
        r["source"]: r
        for b in [bigram_ttr_by_source(str(tmp_path))]
        for r in b.to_pylist()
    }
    # spun: 8 bigram tokens, 2 distinct ('red fox', 'fox red')
    assert out["spun"]["n_bigrams"] == 8
    assert out["spun"]["n_distinct"] == 2
    assert out["spun"]["ttr"] == round(2 / 8 + 1e-9, 4)
    # fresh: 3 + 2 bigrams, all distinct
    assert out["fresh"]["n_bigrams"] == 5
    assert out["fresh"]["n_distinct"] == 5
    assert out["fresh"]["ttr"] == 1.0


def test_leakage_safe_split_docs_colocates_clusters(ray_session):
    """Every jaccard near-dup pair lands in ONE split (the property a
    row-hash split violates), the full corpus is covered exactly once,
    and the split is deterministic across reruns."""
    from newscrawler_ray.pipelines.corpusstats import leakage_safe_split_docs
    from newscrawler_ray.pipelines.dedup import ngram_jaccard_pairs

    sf = "/root/testdata/sf0.01"
    df = (
        leakage_safe_split_docs(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert len(df) == n_docs and df.doc_id.is_unique
    assert set(df.split) <= {"train", "val", "test"}
    split_of = dict(zip(df.doc_id, df.split))
    pairs = ngram_jaccard_pairs(sf, threshold=0.5).to_pandas()
    assert len(pairs) > 0  # the fixture has planted near-dups
    for a, b in zip(pairs.id_a, pairs.id_b):
        assert split_of[a] == split_of[b], (a, b)
    df2 = (
        leakage_safe_split_docs(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert df.equals(df2)


def test_gram_novelty_planted_template(ray_session, tmp_path):
    """A later doc recombining only earlier grams scores novelty 0; the
    first doc scores 1; a half-copied doc lands exactly between."""
    from newscrawler_ray.pipelines.corpusstats import gram_novelty_docs

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fresh = "totally different words appear here nine distinct tokens now"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([a, a, a.split(" iota")[0] + " " + fresh]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(a)] * 3, pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {
        r["doc_id"]: r for r in gram_novelty_docs(str(tmp_path)).take_all()
    }
    assert out[1]["novelty"] == 1.0 and out[1]["n_novel"] == out[1]["n_grams"]
    assert out[2]["novelty"] == 0.0 and out[2]["n_novel"] == 0
    # doc 3 = doc 1's first 8 words + 9 fresh words -> 15 grams, of
    # which the 6 fully inside the copied prefix are old, 9 are new
    assert out[3]["n_grams"] == 15 and out[3]["n_novel"] == 9
    assert out[3]["novelty"] == 0.6


def test_compression_ratio_flags_tails(ray_session, tmp_path):
    """Repeated text flags too_repetitive, high-entropy noise flags
    too_random, prose-like text passes; ratios match a driver zlib
    recompute exactly."""
    import zlib

    from newscrawler_ray.pipelines.corpusstats import compression_ratio_docs

    rep = "spam ham " * 400
    rng = np.random.default_rng(5)
    noise = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 2000))
    # distinct words, no repeated phrase: lands in the prose band
    prose = " ".join(f"word{i} thing{(i * 7) % 997}x" for i in range(120))
    tiny = "hi"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([rep, noise, prose, tiny]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array(
                [len(rep), len(noise), len(prose), len(tiny)], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in compression_ratio_docs(str(tmp_path)).take_all()}
    assert out[1]["flag"] == "too_repetitive"
    assert out[2]["flag"] == "too_random"
    assert out[3]["flag"] == "ok"
    assert out[4]["flag"] == "short"
    for did, txt in [(1, rep), (2, noise), (3, prose)]:
        raw, comp = len(txt.encode()), len(zlib.compress(txt.encode(), 6))
        assert out[did]["raw_len"] == raw and out[did]["comp_len"] == comp
        assert out[did]["ratio"] == round(comp / raw + 1e-9, 4)


def test_strip_dup_spans_maximal_planted(ray_session, tmp_path):
    """Lee et al. length threshold (verdict r4 #4): a SHORT duplicated
    run (one shared 8-gram, 8 words < min_words=20) is preserved by the
    maximal-span path but stripped by the fixed-k path (the documented
    over-strip); a LONG duplicated run (25 shared words >= 20) is
    stripped by both. Unique docs untouched either way."""
    short_dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    long_dup = " ".join(f"tok{i}" for i in range(25))  # 25 words
    texts = [
        f"lead one two {short_dup} tail three four five",
        f"other start {short_dup} different ending here now",
        f"intro {long_dup} outro",
        f"{long_dup} closing words here",
        "unique words only nothing shared at all among these tokens",
    ]
    d = _write_docs(tmp_path, texts)

    fixed = {r["doc_id"]: r for r in corpusstats.strip_dup_spans(d).take_all()}
    maximal = {
        r["doc_id"]: r
        for r in corpusstats.strip_dup_spans_maximal(d, min_words=20).take_all()
    }

    # the over-strip: fixed-k removes the short dup from docs 0/1 ...
    assert fixed[0]["n_removed"] == 8 and fixed[1]["n_removed"] == 8
    # ... the maximal path preserves them whole
    assert maximal[0]["n_removed"] == 0 and maximal[1]["n_removed"] == 0
    assert maximal[0]["clean_text"] == texts[0].lower()
    assert maximal[1]["clean_text"] == texts[1].lower()

    # the long run is stripped by BOTH (>= threshold)
    for res in (fixed, maximal):
        assert res[2]["n_removed"] == 25
        assert res[3]["n_removed"] == 25
    assert maximal[2]["clean_text"] == "intro outro"
    assert maximal[3]["clean_text"] == "closing words here"

    # unique doc untouched
    assert maximal[4]["n_removed"] == 0

    # threshold exactness: a run of exactly min_words words is stripped,
    # one word shorter is not (run cover = p1 - p0 + k)
    exact = " ".join(f"w{i}" for i in range(20))
    under = " ".join(f"u{i}" for i in range(19))
    d2 = _write_docs(tmp_path / "t2" if (tmp_path / "t2").mkdir() or True else tmp_path,
                     [f"a {exact} b {under} c",
                      f"x {exact} y {under} z"])
    m2 = {
        r["doc_id"]: r
        for r in corpusstats.strip_dup_spans_maximal(d2, min_words=20).take_all()
    }
    assert m2[0]["n_removed"] == 20 and m2[1]["n_removed"] == 20


def test_kneser_ney_exact_recompute(ray_session, tmp_path):
    """Interpolated KN trigram (verdict r4 #6): engine output equals a
    pure-Python recompute of the Chen-Goodman formula (string identity,
    independent counting) on a planted corpus; formulaic docs score
    below unique-word docs; short docs have zero events."""
    import math
    import re
    from collections import Counter

    from newscrawler_ray.pipelines.corpusstats import kneser_ney_logprob_docs

    texts = [
        "the cat sat on the mat and the cat sat on the mat again",
        "the cat sat on the mat today",
        "zebra quark nebula violin ember glacier prism harbor",
        "one two",  # < 3 words: no trigram events
        "",
    ]
    d = _write_docs(tmp_path, texts)
    got = {r["doc_id"]: r for r in kneser_ney_logprob_docs(d).take_all()}

    def toks(s):
        return [w for w in re.split(r"\W+", (s or "").lower()) if w]

    docs = {i: toks(t) for i, t in enumerate(texts)}
    c3, c2 = Counter(), Counter()
    for ws in docs.values():
        for i in range(len(ws) - 1):
            c2[(ws[i], ws[i + 1])] += 1
        for i in range(len(ws) - 2):
            c3[(ws[i], ws[i + 1], ws[i + 2])] += 1
    mid1, cont3, mid2 = Counter(), Counter(), Counter()
    for (a, b, c) in c3:
        mid1[(a, b)] += 1
        cont3[(b, c)] += 1
        mid2[b] += 1
    fol, cont2 = Counter(), Counter()
    for (a, b) in c2:
        fol[a] += 1
        cont2[b] += 1
    NT, D = len(c2), 0.75
    for i, ws in docs.items():
        n_tri = max(len(ws) - 2, 0)
        s = 0.0
        for j in range(n_tri):
            a, b, c = ws[j], ws[j + 1], ws[j + 2]
            pcont = cont2[c] / NT
            pbi = (
                max(cont3[(b, c)] - D, 0) / mid2[b]
                + D * fol[b] / mid2[b] * pcont
            )
            p = (
                max(c3[(a, b, c)] - D, 0) / c2[(a, b)]
                + D * mid1[(a, b)] / c2[(a, b)] * pbi
            )
            s += -math.log(p)
        assert got[i]["n_words"] == len(ws)
        assert got[i]["n_trigrams"] == n_tri
        assert got[i]["mean_nll"] == round(s / max(n_tri, 1) + 1e-9, 4), i
    # KN semantics: the formulaic doc scores below the unique-word doc
    assert got[0]["mean_nll"] < got[2]["mean_nll"]
    assert got[3]["n_trigrams"] == 0 and got[3]["mean_nll"] == 0.0


def test_dup_span_runs_planted(ray_session, tmp_path):
    """Flagging side of the maximal-run family: a short shared 8-gram
    yields max_run_words=8 but n_runs=0/flagged=False at min_words=20;
    a 25-word shared passage yields one qualifying run of 25; unique
    docs report zeros."""
    from newscrawler_ray.pipelines.corpusstats import dup_span_runs

    short_dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    long_dup = " ".join(f"tok{i}" for i in range(25))
    texts = [
        f"lead one two {short_dup} tail three four five",
        f"other start {short_dup} different ending here now",
        f"intro {long_dup} outro",
        f"{long_dup} closing words here",
        "unique words only nothing shared at all among these tokens",
    ]
    d = _write_docs(tmp_path, texts)
    got = {r["doc_id"]: r for r in dup_span_runs(d, min_words=20).take_all()}
    for i in (0, 1):
        assert got[i]["max_run_words"] == 8
        assert got[i]["n_runs"] == 0 and not got[i]["flagged"]
    for i in (2, 3):
        assert got[i]["max_run_words"] == 25
        assert got[i]["n_runs"] == 1 and got[i]["flagged"]
    assert got[4]["max_run_words"] == 0 and not got[4]["flagged"]
    assert got[0]["n_words"] == len(texts[0].split())
