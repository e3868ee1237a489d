import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from newscrawler_ray.pipelines import dedup, simsearch

SF = "/root/testdata/sf0.01"


def _planted_docs():
    base = (
        "the quick brown fox jumps over the lazy dog while the rain in spain "
        "falls mainly on the plain and every good boy deserves fudge today"
    )
    near = base.replace("fudge", "candy")  # one word changed -> high jaccard
    other = (
        "completely different content about distributed systems shuffle "
        "partitions actors datasets blocks backpressure streaming execution"
    )
    return rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": other},
            {"doc_id": 4, "text": base},  # exact dup of 1
        ]
    )


def test_minhash_lsh_finds_planted_near_dup(ray_session):
    pairs = dedup.minhash_lsh_pairs(SF, threshold=0.5, docs=_planted_docs()).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found or (1, 4) in found
    assert (1, 4) in found  # exact dup always survives
    for r in pairs:
        assert r["jaccard"] >= 0.5
    assert not any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b in found)


def test_ngram_jaccard_bounds():
    assert dedup.ngram_jaccard("a b c d", "a b c d") == 1.0
    assert dedup.ngram_jaccard("a b c d", "x y z w") == 0.0


def test_simhash_near_texts_close(ray_session):
    ds = _planted_docs()
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash_docs(SF, docs=ds).take_all()}
    assert out[1] == out[4]  # identical text -> identical simhash
    ham = bin((out[1] ^ out[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((out[1] ^ out[3]) & ((1 << 64) - 1)).count("1")
    assert ham < ham_far
    assert ham <= 16


def test_simhash_near_dup_pairs_planted(ray_session):
    ds = _planted_docs()
    pairs = dedup.simhash_near_dup_pairs(SF, max_hamming=16, docs=ds).take_all()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found.get((1, 4)) == 0  # exact dup: guaranteed candidate + verify
    # distant docs must never pair (verify gate), regardless of banding
    assert (1, 3) not in found and (2, 3) not in found
    for ham in found.values():
        assert ham <= 16


def test_exact_dedup_docs_matches_sql(ray_session):
    import duckdb

    got = sorted(r["doc_id"] for r in dedup.exact_dedup_docs(SF).take_all())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = sorted(
        r[0] for r in con.execute("SELECT min(doc_id) FROM documents GROUP BY text").fetchall()
    )
    assert got == want


def _brute_pairs(tau):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    out = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and S[i, j] >= tau:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_embedding_near_dup_matches_brute(ray_session):
    got = {(r["id_a"], r["id_b"]) for r in dedup.embedding_near_dup(SF, tau=0.4).take_all()}
    assert got == _brute_pairs(0.4)
    assert len(got) > 0  # threshold calibrated so the check is non-vacuous


def _brute_topk(k=10, qid=0):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    q = En[list(ids).index(qid)]
    sims = En @ q
    order = [i for i in np.argsort(-sims, kind="stable") if ids[i] != qid]
    return [int(ids[i]) for i in order[:k]]


def test_knn_topk_exact(ray_session):
    got = simsearch.knn_topk(SF)["vec_id"].to_pylist()
    assert sorted(got) == sorted(_brute_topk())


def test_knn_ivf_recall(ray_session):
    approx = set(simsearch.knn_ivf(SF)["vec_id"].to_pylist())
    exact = set(_brute_topk())
    # near-uniform embeddings: recall ~ nprobe/n_cells (= 0.5 expected)
    assert len(approx & exact) / len(exact) >= 0.4


def test_ivf_deterministic():
    a = simsearch.ivf_build(SF)
    b = simsearch.ivf_build(SF)
    np.testing.assert_array_equal(a, b)


def _synth_corpus(path, n=5000, seed=7):
    """Deterministic corpus with planted near-dups: doc i and doc i+n//2
    differ by one word for i % 100 == 0 (and are exact dups for
    i % 500 == 0)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{c:04d}" for c in range(800)]
    half = n // 2
    texts = [
        " ".join(vocab[w] for w in rng.integers(0, 800, 40)) for _ in range(half)
    ]
    mirror = []
    for i in range(half):
        if i % 500 == 0:
            mirror.append(texts[i])  # exact dup
        elif i % 100 == 0:
            words = texts[i].split()
            words[5] = "changed"
            mirror.append(" ".join(words))  # near dup
        else:
            mirror.append(" ".join(vocab[w] for w in rng.integers(0, 800, 40)))
    t = __import__("pyarrow").table(
        {
            "doc_id": list(range(n)),
            "text": texts + mirror,
        }
    )
    pq.write_table(t, path)


def test_minhash_verify_is_distributed_at_10x(ray_session, tmp_path):
    """The Jaccard verify stage must never collect the corpus on the
    driver (round-1 review finding): driver-side iteration of the docs
    dataset is banned outright, and the planted dups at 10x the usual
    test corpus must still be found through the distributed re-join."""
    path = tmp_path / "documents.parquet"
    _synth_corpus(path, n=5000)
    docs = rd.read_parquet(str(path))

    def _forbid(*a, **k):
        raise AssertionError("driver-side corpus collection is banned")

    docs.iter_batches = _forbid
    docs.iter_rows = _forbid
    docs.take_all = _forbid
    docs.to_pandas = _forbid
    pairs = dedup.minhash_lsh_pairs(
        str(tmp_path), threshold=0.5, docs=docs
    ).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(0, 2500, 500):
        assert (i, i + 2500) in found  # exact dups always survive
    near_expected = {(i, i + 2500) for i in range(0, 2500, 100)}
    assert len(found & near_expected) >= 20  # near-dups found
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_embedding_near_dup_ivf_recall(ray_session):
    """Cell-bucketed approximate pairs: no false positives (cos is
    verified exactly within cells) and recall vs the exact block-pair
    operator clears the asserted bound."""
    exact = _brute_pairs(0.4)
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_ivf(SF, tau=0.4).take_all()
    }
    assert approx <= exact  # within-cell cosine is exact -> no false pairs
    assert len(approx & exact) / len(exact) >= 0.5


def test_ngram_jaccard_pairs_matches_brute_force(ray_session):
    # prefix filtering must be EXACT: every pair with J >= t, no extras
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    for i in (40, 45, 50):  # near copies of doc 0 with one word changed
        base = texts[0].split()
        base[i % 30] = "zzz"
        texts[i] = " ".join(base)
    import pyarrow as pa

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)})
    )
    for t in (0.3, 0.5, 0.8):
        got = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                "unused", threshold=t, docs=docs, num_partitions=4
            ).take_all()
        )
        exp = sorted(
            (i, j, round(dedup.ngram_jaccard(texts[i], texts[j], 3), 4))
            for i in range(60)
            for j in range(i + 1, 60)
            if dedup.ngram_jaccard(texts[i], texts[j], 3) >= t
        )
        assert got == exp


def test_ngram_jaccard_pairs_planted(ray_session):
    pairs = dedup.ngram_jaccard_pairs(SF, threshold=0.5, docs=_planted_docs()).take_all()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in found and found[(1, 2)] >= 0.5
    assert not any({a, b} == {1, 3} for (a, b) in found)


def test_corpus_dedup_keeps_cluster_min(ray_session):
    # planted: docs 1,2,4 form one near-dup cluster (1 survives); 3 distinct
    out = dedup.minhash_dedup_docs(SF, docs=_planted_docs()).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_jaccard_dedup_transitive_chain(ray_session):
    # a ~ b and b ~ c but a !~ c: transitivity must still collapse all
    # three into one cluster (survivor = min id)
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    words = base.split()
    mid = words[:9] + ["xray", "yankee", "zulu", "whiskey", "victor",
                       "uniform", "tango", "sierra", "shift"]
    far = mid[9:] + ["one", "two", "three", "four", "five", "six",
                     "seven", "eight", "nine"]
    import pyarrow as pa

    texts = [" ".join(words), " ".join(mid), " ".join(far)]
    j01 = dedup.ngram_jaccard(texts[0], texts[1])
    j12 = dedup.ngram_jaccard(texts[1], texts[2])
    j02 = dedup.ngram_jaccard(texts[0], texts[2])
    t = 0.9 * min(j01, j12)
    assert j02 < t  # genuinely non-adjacent endpoints
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                  "text": pa.array(texts)})
    )
    pairs = dedup.ngram_jaccard_pairs("unused", threshold=t, docs=docs,
                                      num_partitions=2)
    out = dedup._survivors(docs, pairs, 2).take_all()
    assert sorted(r["doc_id"] for r in out) == [10]


def test_jaccard_dedup_high_partition_count(ray_session, tmp_path):
    """Round-2 regression: jaccard_dedup_docs crashed at production
    partition counts (rename_columns saw the unprojected 3-column join
    schema). Run the full pipeline at 8 partitions — 4x the test
    cluster's CPU-derived default (16+ deadlocks Ray's join-actor
    scheduling when partitions >> CPUs; the 0-column-block hazard
    itself is covered directly below) — and check survivors."""
    import pyarrow as pa

    base = (
        "the quick brown fox jumps over the lazy dog while the rain in spain "
        "falls mainly on the plain and every good boy deserves fudge today"
    )
    rows = {"doc_id": [], "text": []}
    rng = np.random.default_rng(13)
    vocab = [f"v{i}" for i in range(300)]
    for i in range(40):
        rows["doc_id"].append(i)
        if i in (0, 7):
            rows["text"].append(base)
        elif i == 21:
            rows["text"].append(base.replace("fudge", "candy"))
        else:
            rows["text"].append(" ".join(rng.choice(vocab, size=30)))
    pq.write_table(
        pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                  "text": pa.array(rows["text"])}),
        tmp_path / "documents.parquet",
    )
    out = dedup.jaccard_dedup_docs(
        str(tmp_path), threshold=0.5, num_partitions=8
    ).take_all()
    got = sorted(r["doc_id"] for r in out)
    assert 0 in got and 7 not in got and 21 not in got
    assert len(got) == 38  # 40 docs, cluster {0,7,21} keeps only 0


def test_ngram_df_cap_preserves_exactness(ray_session):
    """The broadcast df map is capped (scale path): a tiny cap must not
    change the verified pair set — any consistent total order preserves
    the prefix-filter theorem."""
    import pyarrow as pa

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    for i in (40, 45, 50):
        b = texts[0].split()
        b[i % 30] = "zzz"
        texts[i] = " ".join(b)
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)})
    )
    full = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            "unused", threshold=0.5, docs=docs, num_partitions=4
        ).take_all()
    )
    capped = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            "unused", threshold=0.5, docs=docs, num_partitions=4, df_cap=5
        ).take_all()
    )
    assert capped == full and len(full) > 0


def test_simhash_zero_hash_skew_bounded(ray_session):
    """10k token-less docs all simhash to 0 — round 2's skew hazard.
    The zero-hash clique must come back as its spanning star (min id
    paired with every other, hamming 0) in bounded time, and must not
    pair with nonzero-hash docs."""
    import time

    import pyarrow as pa

    n_empty = 10_000
    texts = ["", "   ", ". , !"] * (n_empty // 3) + [""] * (n_empty % 3)
    base = (
        "the quick brown fox jumps over the lazy dog while the rain in "
        "spain falls mainly on the plain tonight"
    )
    all_texts = texts + [base, base]  # 2 identical real docs
    ids = list(range(n_empty)) + [100_000, 100_001]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(all_texts)})
    )
    t0 = time.monotonic()
    pairs = dedup.simhash_near_dup_pairs("unused", max_hamming=3, docs=docs).take_all()
    elapsed = time.monotonic() - t0
    assert elapsed < 60  # star emission, not the 5*10^7-pair clique
    star = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 100_000}
    assert star == {(0, i) for i in range(1, n_empty)}
    assert {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] >= 100_000} == {
        (100_000, 100_001)
    }
    assert all(r["hamming"] == 0 for r in pairs)


def test_cc_tolerates_mixed_schema_pair_blocks(ray_session):
    """The exact round-2 crash shape: a verified-pairs dataset whose
    blocks mix the (id_a, id_b, jaccard) schema with the 0-column empty
    blocks Ray's hash shuffles emit for group-less partitions.
    connected_components must project it robustly (no
    select_columns/rename_columns on the lazily derived schema)."""
    import pyarrow as pa

    from newscrawler_ray.pipelines.graph import connected_components

    full = pa.table(
        {"id_a": pa.array([1, 2, 50], pa.int64()),
         "id_b": pa.array([2, 3, 60], pa.int64()),
         "jaccard": pa.array([0.9, 0.8, 0.7], pa.float64())}
    )
    ds = rd.from_arrow([full, pa.table({}), pa.table({})]).repartition(6)
    labels = {
        r["node"]: r["component"] for r in connected_components(ds).take_all()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 50: 50, 60: 50}
    # and through the distributed star path too
    labels2 = {
        r["node"]: r["component"]
        for r in connected_components(ds, small_edges=0).take_all()
    }
    assert labels2 == labels


def test_crossmodal_dedup_bridges_modalities(ray_session, tmp_path):
    """A text-dup edge (0~1) and an embedding-dup edge (1~2) must chain
    into ONE cluster through the cross-modal closure, even though 0 and
    2 are unrelated in both modalities. Clusters that exist in only one
    modality ({3,4} text-only, {5,6} embedding-only) and the singleton
    (7) behave like the single-modal operators."""
    import pyarrow as pa

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo").split()
    uniq = [
        " ".join(f"w{d}x{j}" for j in range(18)) for d in range(8)
    ]
    texts = list(uniq)
    texts[1] = " ".join(base)           # 0 ~ 1 by text
    texts[0] = " ".join(base)
    texts[4] = texts[3]                 # 3 ~ 4 by text
    # embeddings: orthogonal one-hot per doc, except 1~2 and 5~6 share
    dim = 16
    E = np.zeros((8, dim))
    for d in range(8):
        E[d, d] = 1.0
    E[2] = E[1]
    E[6] = E[5]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.table({"vec_id": pa.array(range(8), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in E],
                                        pa.list_(pa.float64()))}),
        tmp_path / "embeddings.parquet",
    )
    out = dedup.crossmodal_dedup_docs(
        str(tmp_path), tau=0.4, threshold=0.5, num_partitions=2
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 3, 5, 7]


def test_kmeans_assign_invariants(ray_session):
    """Distributed k-means invariants: (1) the emitted (cluster, sim)
    is EXACTLY the argmax assignment under the returned final centroids,
    (2) reruns are deterministic, (3) the Lloyd loop did not worsen the
    spherical objective vs the sample-trained init."""
    import pyarrow.parquet as pq

    ds, cents = simsearch.kmeans_assign(SF, return_centroids=True)
    out = {r["vec_id"]: (r["cluster"], r["sim"]) for r in ds.take_all()}
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    E = simsearch._norm(simsearch.emb_matrix(t.column("embedding")))
    sims = E @ cents.T
    assign = np.argmax(sims, axis=1)
    best = np.round(sims[np.arange(len(E)), assign] + 1e-9, 4)
    assert len(out) == len(ids)
    for i, vid in enumerate(ids.tolist()):
        assert out[vid][0] == assign[i], vid
        assert out[vid][1] == best[i], vid
    assert len(set(assign.tolist())) > 1
    # objective improved (or held) vs the sample-trained seed centroids
    seed_cents = simsearch.ivf_build(SF)
    seed_obj = float(np.max(E @ seed_cents.T, axis=1).mean())
    final_obj = float(np.max(sims, axis=1).mean())
    assert final_obj >= seed_obj - 1e-9
    # determinism: a second full run emits the identical table
    out2 = {
        r["vec_id"]: (r["cluster"], r["sim"])
        for r in simsearch.kmeans_assign(SF).take_all()
    }
    assert out2 == out


# --------------------------------------------- incremental / bloom dedup


def test_incremental_exact_dedup_semantics(ray_session):
    """Survivors = new-snapshot docs whose text is absent from the old
    corpus, first-wins within the snapshot — checked against a driver
    set computation on the raw parquet."""
    import duckdb

    got = sorted(
        dedup.incremental_exact_dedup(SF).to_pandas()["doc_id"].tolist()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"""WITH old AS (SELECT text FROM read_parquet('{SF}/documents.parquet')
                             WHERE doc_id % 7 < 5),
                     nw AS (SELECT doc_id, text
                            FROM read_parquet('{SF}/documents.parquet')
                            WHERE doc_id % 7 >= 5)
                SELECT min(doc_id) FROM nw
                WHERE text NOT IN (SELECT text FROM old) GROUP BY text"""
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_bloom_dedup_no_false_negatives_and_bounded_fp(ray_session):
    """Every true duplicate is dropped (bloom has no false negatives);
    false positives stay under 5% of the exact survivor set at the
    default 10 bits/key (~1% expected)."""
    exact = set(dedup.incremental_exact_dedup(SF).to_pandas()["doc_id"])
    bloom = set(dedup.bloom_dedup_docs(SF).to_pandas()["doc_id"])
    # no false negatives: bloom never keeps a doc the exact op dropped
    assert bloom <= exact
    # bounded false positives: bloom drops at most 5% extra
    assert len(exact - bloom) <= max(2, int(0.05 * len(exact)))
    # determinism
    again = set(dedup.bloom_dedup_docs(SF).to_pandas()["doc_id"])
    assert again == bloom


def test_bloom_kernel_membership():
    """Inserted keys always hit; random non-keys mostly miss."""
    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**62), 2**62, 4000, dtype=np.int64)
    m = dedup._bloom_size(len(keys))
    bits = np.zeros(m // 8, np.uint8)
    pos = dedup._bloom_positions(keys, m).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    assert dedup.bloom_contains(bits, keys, m).all()
    probes = rng.integers(-(2**62), 2**62, 20000, dtype=np.int64)
    fresh = probes[~np.isin(probes, keys)]
    fp = dedup.bloom_contains(bits, fresh, m).mean()
    assert fp < 0.03, fp


# ----------------------------------------------------------------- PQ


def test_pq_codes_shape_and_determinism(ray_session):
    books = simsearch.pq_train(SF)
    again = simsearch.pq_train(SF)
    np.testing.assert_array_equal(books, again)
    assert books.shape == (8, 16, 8)
    codes = simsearch.pq_encode(SF, books=books).take_all()
    assert len(codes) == 500
    for r in codes[:20]:
        assert len(r["code"]) == 8


def test_knn_pq_recall(ray_session):
    """ADC + in-batch exact refine: recall floor vs brute force on the
    near-uniform driver embeddings (the hard case for PQ), and exact
    recovery on clustered vectors (the realistic case)."""
    approx = set(simsearch.knn_pq(SF)["vec_id"].to_pylist())
    exact = set(_brute_topk())
    assert len(approx & exact) / len(exact) >= 0.5

    # clustered corpus: 10 tight clusters; the query's cluster mates are
    # the true top-k and PQ must find them all
    import pyarrow.parquet as pqt

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 50, axis=0) + rng.normal(scale=0.02, size=(500, 64))
    import tempfile, os

    d = tempfile.mkdtemp(prefix="pqtest", dir="/tmp")
    pqt.write_table(
        __import__("pyarrow").table(
            {
                "vec_id": list(range(500)),
                "embedding": [v.astype("float32").tolist() for v in vecs],
                "label": ["x"] * 500,
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    got = set(simsearch.knn_pq(d, query_vec_id=0, k=10)["vec_id"].to_pylist())
    qn = vecs[0] / np.linalg.norm(vecs[0])
    En = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = En @ qn
    order = [i for i in np.lexsort((np.arange(500), -sims)) if i != 0][:10]
    assert len(got & set(order)) / 10 >= 0.9


def test_knn_pq_external_query_keeps_vec_zero(ray_session):
    """Regression: with an external (ds, query) pair no id is excluded —
    vec_id 0 must be returnable (the by-id mask applies only when the
    query is loaded from the corpus by id)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 64))
    q = vecs[0] + rng.normal(scale=0.001, size=64)  # vec 0 is the nearest
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    got = simsearch.knn_pq("", ds=ds, query=q, k=5)["vec_id"].to_pylist()
    assert 0 in got


def test_semdedup_matches_brute_force(ray_session):
    """SemDeDup survivor set equals a driver brute-force recompute from
    the SAME deterministic centroids: per-cluster pairs at cos >= tau,
    union-find closure, keep the min-(centroid-sim, id) member per
    component (the paper's keep-farthest-from-centroid rule)."""
    tau = 0.4
    got = sorted(r["doc_id"] for r in dedup.semdedup_docs(SF, tau=tau).take_all())

    _, cents = simsearch.kmeans_assign(SF, return_centroids=True)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ cents.T
    a = sims.argmax(axis=1)
    best = np.round(sims[np.arange(len(En)), a] + 1e-9, 4)

    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for c in np.unique(a):
        idx = np.nonzero(a == c)[0]
        S = En[idx] @ En[idx].T
        for p in range(len(idx)):
            for q in range(p + 1, len(idx)):
                if S[p, q] >= tau:
                    ra, rb = find(int(ids[idx[p]])), find(int(ids[idx[q]]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    pos = {int(v): k for k, v in enumerate(ids)}
    for i in ids:
        groups.setdefault(find(int(i)), []).append(int(i))
    keep = sorted(
        min(members, key=lambda m: (best[pos[m]], m))
        for members in groups.values()
    )
    assert got == keep
    assert len(got) < len(ids)  # non-vacuous: fixtures plant near-dups


def test_minhash_family_equals_exact(ray_session):
    """Pins the property that lets the MinHash family carry the exact
    operators' SQL oracles in the driver contract: every LSH candidate
    is exact-verified (subset is structural), and on this corpus the
    16x4 banding's recall is 1.0, so the outputs are EQUAL. If a fixture
    or kernel change ever breaks the equality, this trips before the
    driver's CORRECTNESS pass does — remove the oracle aliases in
    __ray_entry__.oracle_sql() if that happens."""
    mh = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(SF, threshold=0.5).take_all()
    )
    ng = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(SF, threshold=0.5).take_all()
    )
    assert mh == ng and len(mh) > 0
    md = sorted(r["doc_id"] for r in dedup.minhash_dedup_docs(SF, threshold=0.5).take_all())
    jd = sorted(r["doc_id"] for r in dedup.jaccard_dedup_docs(SF, threshold=0.5).take_all())
    assert md == jd and len(md) > 0


def _brute_containment(texts, t, k=3):
    def grams(s):
        return set(dedup._shingles(s, k).tolist())

    gs = [grams(x) for x in texts]
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            lo = min(len(gs[i]), len(gs[j]))
            if lo == 0:
                continue
            c = len(gs[i] & gs[j]) / lo
            if c >= t:
                out.append((i, j, round(c, 4)))
    return sorted(out)


def test_containment_pairs_matches_brute_force(ray_session):
    # the containment prefix filter must be EXACT: every pair with
    # |A∩B|/min >= t, no extras — including across partition counts
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    for i in (40, 45, 50):
        base = texts[0].split()
        base[i % 30] = "zzz"
        texts[i] = " ".join(base)
    import pyarrow as pa

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)})
    )
    # 8 partitions = 2x the test cluster's CPUs (16+ deadlocks Ray's
    # join-actor scheduling when partitions >> CPUs — see
    # test_jaccard_dedup_high_partition_count)
    for t, nparts in ((0.4, 4), (0.6, 8), (0.9, 4)):
        got = sorted(
            (r["id_a"], r["id_b"], r["containment"])
            for r in dedup.ngram_containment_pairs(
                "unused", threshold=t, docs=docs, num_partitions=nparts
            ).take_all()
        )
        assert got == _brute_containment(texts, t)


def test_containment_catches_asymmetric_quote(ray_session):
    # a short doc quoted whole inside a long one: containment 1.0 but
    # Jaccard far below threshold — the pair Jaccard misses by design
    rng = np.random.default_rng(10)
    vocab = [f"w{i}" for i in range(200)]
    short = " ".join(rng.choice(vocab, size=12))
    long = short + " " + " ".join(rng.choice(vocab, size=180))
    filler = [" ".join(rng.choice(vocab, size=60)) for _ in range(8)]
    texts = [short, long, *filler]
    import pyarrow as pa

    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.ngram_containment_pairs(
            "unused", threshold=0.9, docs=docs, num_partitions=4
        ).take_all()
    }
    assert cont[(0, 1)] == 1.0
    jac = dedup.ngram_jaccard(short, long, 3)
    assert jac < 0.2  # jaccard would never flag this pair at 0.5


def test_incremental_jaccard_dedup_contract(ray_session, tmp_path):
    """Planted semantics: a new doc near-dup of an OLD doc drops; two
    new docs that are near-dups of each other both survive (only exact
    copies collapse within the snapshot); exact new-new copies
    first-wins. doc_id % 7 >= 5 is 'new'."""
    import pyarrow as pa

    rng = np.random.default_rng(31)
    vocab = [f"v{i}" for i in range(300)]
    base_old = " ".join(rng.choice(vocab, size=40))
    near_new = base_old.replace(base_old.split()[3], "zzz")  # ~ old -> drop
    twin_a = " ".join(rng.choice(vocab, size=40))
    twin_b = twin_a.replace(twin_a.split()[7], "qqq")  # new~new -> both stay
    exact = " ".join(rng.choice(vocab, size=40))
    texts, ids = {}, []
    # old side: ids % 7 < 5
    texts[0] = base_old
    texts[1] = " ".join(rng.choice(vocab, size=40))
    # new side: ids % 7 >= 5
    texts[5] = near_new
    texts[6] = twin_a
    texts[12] = twin_b
    texts[13] = exact
    texts[19] = exact  # exact copy of 13 -> first-wins keeps 13
    texts[20] = " ".join(rng.choice(vocab, size=40))  # fresh unique
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pa.array([texts[i] for i in ids])}
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup.incremental_jaccard_dedup(
            str(tmp_path), threshold=0.5, num_partitions=4
        ).take_all()
    )
    assert got == [6, 12, 13, 20]


def test_containment_dedup_transitive(ray_session, tmp_path):
    """Quote-chain closure: short S contained in A, A contained in
    longer B -> {S, A, B} is one cluster keeping min id, even though
    S-vs-B Jaccard is tiny."""
    import pyarrow as pa

    rng = np.random.default_rng(41)
    vocab = [f"v{i}" for i in range(400)]
    short = " ".join(rng.choice(vocab, size=10))
    mid = short + " " + " ".join(rng.choice(vocab, size=8))
    longd = mid + " " + " ".join(rng.choice(vocab, size=60))
    texts = {0: short, 1: mid, 2: longd}
    for i in range(3, 20):
        texts[i] = " ".join(rng.choice(vocab, size=40))
    ids = sorted(texts)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([texts[i] for i in ids])}),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup.containment_dedup_docs(
            str(tmp_path), threshold=0.9, num_partitions=4
        ).take_all()
    )
    assert got == [0] + list(range(3, 20))  # 1 and 2 fold into 0's cluster
    # ... and the jaccard dedup at the same bar keeps all three
    jd = sorted(
        r["doc_id"]
        for r in dedup.jaccard_dedup_docs(
            str(tmp_path), threshold=0.9, num_partitions=4
        ).take_all()
    )
    assert jd == list(range(20))


def test_normalized_exact_dedup_planted(ray_session, tmp_path):
    import pyarrow as pa

    texts = [
        "The quick brown fox!",
        "the  quick   BROWN fox",   # same after normalization
        "the quick brown fox.",     # same after normalization
        "an entirely different doc",
        "An, entirely; different doc",  # same as 3
        "something else",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup.normalized_exact_dedup(str(tmp_path)).take_all()
    )
    assert got == [0, 3, 5]


def test_edit_distance_pairs_planted_typos(ray_session):
    base = "the quick brown fox jumps over the lazy dog tonight again ok"
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("quick", "quack", 1)},  # sub
            {"doc_id": 3, "text": base.replace("brown ", "brrown ", 1)},  # ins
            {"doc_id": 4, "text": base.replace("jumps", "jmps", 1)},  # del
            {"doc_id": 5, "text": base},  # exact dup
            {"doc_id": 6, "text": "entirely unrelated text here that shares nothing at all with it"},
            {"doc_id": 7, "text": base.replace("quick", "qwyck", 1)},  # dist 2 from 1
        ]
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dedup.edit_distance_pairs(SF, docs=docs).take_all()
    }
    # brute-force oracle over the same 60-char prefix
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                prev = cur
        return dp[-1]

    rows = {r["doc_id"]: r["text"][:60] for r in docs.take_all()}
    want = {
        (a, b): lev(rows[a], rows[b])
        for a, b in itertools.combinations(sorted(rows), 2)
        if lev(rows[a], rows[b]) <= 1
    }
    assert got == want
    assert got[(1, 2)] == 1 and got[(1, 5)] == 0 and (1, 7) not in got


def test_edit_distance_pairs_high_partition_count(ray_session):
    # regression guard: pair mine + join verify at >= 16 coarse parts
    out = dedup.edit_distance_pairs(SF, num_partitions=8)
    rows = out.take_all()
    assert len(rows) == 25  # matches the DuckDB levenshtein oracle count
    assert all(r["dist"] <= 1 for r in rows)


def test_edit_distance_pairs_sparse_partitions(ray_session):
    """Driver-sweep regression (num_cpus=32): ONE candidate pair across
    8 partitions leaves most distinct-aggregate partitions empty, and
    those emit 0-COLUMN blocks the verify join cannot key unless they
    are coalesced AFTER the distinct. Two near-identical docs + filler
    reproduce the sweep failure shape at the test session's safe
    partition count."""
    import ray.data as rd

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dot"},
        ]
        + [
            {"doc_id": 10 + i, "text": f"{'xyzqvw'[i] * (5 + i)} filler {i} " + "pad" * i}
            for i in range(6)
        ]
    )
    rows = dedup.edit_distance_pairs(SF, docs=docs, num_partitions=8).take_all()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in rows] == [(1, 2, 1)]
