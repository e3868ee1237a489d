"""BPE tokenizer training + corpus encoding.

Oracle strategy: the merge loop is a pure function of the word-frequency
table, so the tests (a) hand-check the classic Sennrich example, (b)
retrain brute-force from DuckDB-computed word counts at sf0.001 and
assert the pipeline's merge table is EXACTLY equal, and (c) re-encode
every doc with a reference encoder and assert per-doc token counts are
exactly equal.
"""

import duckdb
import numpy as np
import pytest
import ray.data as rd

from newscrawler_ray.pipelines import tokenizer as tk

SF = "/root/testdata/sf0.001"


# -------------------------------------------------- brute-force reference


def _brute_learn(words, freqs, n_merges, min_count=2):
    """Textbook O(rounds * table) trainer — no indexed updates, used to
    check the incremental implementation."""
    syms = [list(w) for w in words]
    merges = []
    for _ in range(n_merges):
        stats = {}
        for s, f in zip(syms, freqs):
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                stats[p] = stats.get(p, 0) + int(f)
        if not stats:
            break
        pair, count = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < min_count:
            break
        merges.append((pair[0], pair[1], count))
        for wi, s in enumerate(syms):
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
    return merges


def _duckdb_word_counts(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        r"""
        WITH w AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
                 x -> x <> '')) AS w
          FROM read_parquet(?)
        )
        SELECT w, count(*)::BIGINT c FROM w GROUP BY w ORDER BY c DESC, w
        """,
        [f"{sf_dir}/documents.parquet"],
    ).fetchall()
    con.close()
    return [r[0] for r in rows], np.array([r[1] for r in rows], np.int64)


# ------------------------------------------------------------- unit tests


def test_learn_bpe_classic_example():
    # Sennrich's example vocabulary (no end-of-word marker variant)
    words = ["low", "lower", "newest", "widest"]
    freqs = np.array([5, 2, 6, 3], np.int64)
    merges = tk.learn_bpe(words, freqs, 4)
    # 'es' appears in newest(6) + widest(3) = 9 — the top pair; then
    # ('es','t') 9; then ('l','o') 7; then ('lo','w') 7
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("l", "o", 7)
    assert merges[3] == ("lo", "w", 7)


def test_learn_bpe_matches_brute_force_and_tiebreak():
    words = ["abab", "baba", "aa", "bb", "ab"]
    freqs = np.array([3, 3, 2, 2, 1], np.int64)
    got = tk.learn_bpe(words, freqs, 10)
    want = _brute_learn(words, freqs, 10)
    assert got == want and len(got) > 0
    # deterministic tie-break: equal-count pairs pick lexicographic min
    w2 = ["cd", "ab"]
    f2 = np.array([4, 4], np.int64)
    assert tk.learn_bpe(w2, f2, 1)[0] == ("a", "b", 4)


def test_encode_word_applies_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert tk.encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert tk.encode_word("lowest", ranks) == ["low", "est"]
    assert tk.encode_word("xyz", ranks) == ["x", "y", "z"]
    assert tk.encode_word("", ranks) == []


def test_min_count_stops_training():
    words, freqs = ["ab"], np.array([1], np.int64)
    assert tk.learn_bpe(words, freqs, 5) == []  # best pair count 1 < 2
    assert tk.learn_bpe(words, freqs, 5, min_count=1) == [("a", "b", 1)]


# -------------------------------------------------------- pipeline oracle


def test_train_bpe_merges_equals_duckdb_retrain(ray_session):
    got = tk.train_bpe_merges(SF, n_merges=48).take_all()
    words, freqs = _duckdb_word_counts(SF)
    want = _brute_learn(words, freqs, 48)
    assert [(r["left"], r["right"], r["pair_count"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(len(want)))
    assert len(want) > 0


def test_bpe_encode_docs_matches_reference(ray_session):
    words, freqs = _duckdb_word_counts(SF)
    merges = [(l, r) for l, r, _ in _brute_learn(words, freqs, 48)]
    ranks = {m: i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in tk.bpe_encode_docs(SF, n_merges=48).take_all()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    import re

    wre = re.compile(r"\w+", re.ASCII)
    assert len(got) == len(rows)
    for doc_id, text in rows:
        ws = [w for w in wre.findall(text.lower()) if w]
        n_tokens = sum(len(tk.encode_word(w, ranks)) for w in ws)
        assert got[doc_id] == (len(ws), n_tokens), doc_id
    # merges genuinely compress: fewer tokens than characters-in-words
    assert sum(t for _, t in got.values()) < sum(w for w, _ in got.values()) * 4


def test_word_type_cap_keeps_most_frequent(ray_session):
    """With the cap far below the vocabulary, training still runs and
    equals brute-force training on the top-cap word types (the running
    trim is an exact selection over the post-groupby stream)."""
    got = tk.train_bpe_merges(SF, n_merges=8, max_word_types=10).take_all()
    words, freqs = _duckdb_word_counts(SF)
    want = _brute_learn(words[:10], freqs[:10], 8)
    assert [(r["left"], r["right"], r["pair_count"]) for r in got] == want


def test_prepare_training_data_end_to_end(ray_session, tmp_path):
    """The full curate->tokenize->pack->shard tier: survivors equal the
    curation op, token counts equal a reference encode under merges
    trained on the SURVIVOR corpus, bins respect capacity and never
    split across shards, and a rerun skips every finished shard."""
    import pyarrow.parquet as pq

    from newscrawler_ray.pipelines import corpusstats as cs

    out = tmp_path / "td"
    man = cs.prepare_training_data(SF, out, capacity=256, n_shards=4)
    n_rows = {r["shard"]: r["n_rows"] for r in man.to_pylist()}
    assert not any(r["skipped"] for r in man.to_pylist())

    rows = []
    for s in range(4):
        sdir = out / f"shard={s:04d}"
        assert (sdir / "_DONE").exists()
        got = [
            r
            for f in sorted(sdir.glob("*.parquet"))
            for r in pq.read_table(f).to_pylist()
        ]
        assert len(got) == n_rows[s]
        rows.extend(got)

    # 1. survivors == curate output
    surv = {r["doc_id"] for r in cs.curate_text_corpus(SF).take_all()}
    assert {r["doc_id"] for r in rows} == surv and len(surv) > 0

    # 2. token counts == reference encode under survivor-trained merges
    words, freqs = _duckdb_word_counts(SF)
    # recompute survivor word counts brute-force
    import duckdb, re

    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    con.close()
    wre = re.compile(r"\w+", re.ASCII)
    from collections import Counter

    c = Counter(w for d in sorted(surv) for w in wre.findall(texts[d].lower()))
    sw = sorted(c, key=lambda w: (-c[w], w))
    merges = [
        (l, r)
        for l, r, _ in _brute_learn(sw, np.array([c[w] for w in sw], np.int64), 64)
    ]
    ranks = {m: i for i, m in enumerate(merges)}
    for r in rows:
        want = sum(
            len(tk.encode_word(w, ranks)) for w in wre.findall(texts[r["doc_id"]].lower())
        )
        assert r["n_tokens"] == want, r["doc_id"]

    # 3. bin invariants: <= capacity unless single oversized doc; a bin
    #    never spans two shards (shard = pure function of bin_id — check
    #    via the written layout)
    from collections import defaultdict

    bins = defaultdict(list)
    for s in range(4):
        sdir = out / f"shard={s:04d}"
        for f in sdir.glob("*.parquet"):
            for r in pq.read_table(f).to_pylist():
                bins[r["bin_id"]].append((s, r["n_tokens"]))
    for bid, members in bins.items():
        assert len({s for s, _ in members}) == 1, bid
        tot = sum(t for _, t in members)
        assert tot <= 256 or len(members) == 1, (bid, tot)

    # 4. resume: rerun skips everything
    man2 = cs.prepare_training_data(SF, out, capacity=256, n_shards=4)
    assert all(r["skipped"] for r in man2.to_pylist())


def test_more_merges_never_increase_tokens(ray_session):
    t16 = sum(r["n_tokens"] for r in tk.bpe_encode_docs(SF, n_merges=16).take_all())
    t64 = sum(r["n_tokens"] for r in tk.bpe_encode_docs(SF, n_merges=64).take_all())
    n_words = sum(r["n_words"] for r in tk.bpe_encode_docs(SF, n_merges=16).take_all())
    assert t64 <= t16
    assert t64 >= n_words  # a word is never fewer than 1 token


# ---------------------------------------------------- byte-level BPE


def test_bytes_to_unicode_bijective():
    m = tk.bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert all(0 <= b < 256 for b in m)
    # printable ascii maps to itself (GPT-2 contract)
    assert m[ord("A")] == "A" and m[ord("!")] == "!"


def test_gpt2_pretokenizer_shapes():
    import re

    pat = re.compile(tk.GPT2_SPLIT_PATTERN)
    toks = pat.findall("Hello world's  end!\nnew 42x")
    # leading-space attachment, contraction split, punct runs separate
    assert "".join(toks) == "Hello world's  end!\nnew 42x"
    assert " world" in toks and "'s" in toks and "!" in toks
    assert " 42" in toks and "x" in toks


def test_byte_bpe_merges_match_brute_force(ray_session):
    """Exact equality with a brute-force retrain from an INDEPENDENTLY
    computed pre-token count table (plain re.findall + Counter over the
    parquet, textbook O(rounds*table) trainer)."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in tk.byte_bpe_merges(SF, n_merges=48).take_all()
    ]

    pat = re.compile(tk.GPT2_SPLIT_PATTERN)
    cnt: Counter = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet", columns=["text"]) \
            .column("text").to_pylist():
        cnt.update(pat.findall(t or ""))
    b2u = tk.bytes_to_unicode()
    types = sorted(cnt, key=lambda w: (-cnt[w], w))
    sym = ["".join(b2u[b] for b in w.encode("utf-8")) for w in types]
    freqs = np.array([cnt[w] for w in types], np.int64)
    want = _brute_learn(sym, freqs, 48)
    assert got == want
    assert len(got) == 48  # corpus is rich enough to fill the budget


def test_byte_bpe_encode_docs_reference_encode(ray_session):
    """Per-doc token counts exactly equal a reference re-encode of every
    doc under the trained merges (byte path: multi-byte UTF-8 and
    whitespace runs all representable — no unknown tokens)."""
    import re

    import pyarrow.parquet as pq

    rows = {r["doc_id"]: r for r in tk.byte_bpe_encode_docs(SF, n_merges=48).take_all()}
    merges = [
        (r["left"], r["right"])
        for r in tk.byte_bpe_merges(SF, n_merges=48).take_all()
    ]
    ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
    b2u = tk.bytes_to_unicode()
    pat = re.compile(tk.GPT2_SPLIT_PATTERN)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_checked = 0
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        toks = pat.findall(text or "")
        want = sum(
            len(
                tk.encode_word(
                    "".join(b2u[b] for b in w.encode("utf-8")), ranks
                )
            )
            for w in toks
        )
        assert rows[doc_id]["n_pretokens"] == len(toks)
        assert rows[doc_id]["n_tokens"] == want
        n_checked += 1
    assert n_checked == len(rows) and n_checked > 0


def test_byte_bpe_multibyte_and_whitespace(ray_session, tmp_path):
    """Unicode (multi-byte UTF-8) text and whitespace runs round-trip
    through the byte alphabet: token counts are positive and pre-token
    concatenation is lossless on the planted docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["héllo wörld — naïve", "tabs\t\tand\n\nnewlines  here", "中文 text"]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(3), pa.int64()),
             "text": pa.array(texts, pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    rows = {
        r["doc_id"]: r
        for r in tk.byte_bpe_encode_docs(str(tmp_path), n_merges=8).take_all()
    }
    assert all(rows[i]["n_tokens"] > 0 for i in range(3))
    # bytes are all representable: token count >= pretoken count only
    # when merges are few; at minimum every pretoken yields >= 1 token
    assert all(rows[i]["n_tokens"] >= rows[i]["n_pretokens"] for i in range(3))
