"""Invariant tests for the mixture-upsampling, held-out-split and
blocklist-scrub operators (SQL parity is covered by test_query_parity;
these check the semantic contracts on controlled fixtures)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newscrawler_ray.pipelines import corpusstats, textstats


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


# --------------------------------------------------- upsample_mixture_docs


def _mixture_fixture(tmp_path):
    # srcA: 4 docs x 8 tokens = 32; srcB: 2 docs x 2 tokens = 4
    # rate(A) = sqrt(32/32) = 1.0 exactly; rate(B) = sqrt(32/4) ~ 2.83
    rows = [(i, "w " * 8, "srcA") for i in range(4)]
    rows += [(10 + i, "w w", "srcB") for i in range(2)]
    return _write_docs(tmp_path, rows)


def test_upsample_rates_and_epochs(ray_session, tmp_path):
    d = _mixture_fixture(tmp_path)
    out = corpusstats.upsample_mixture_docs(d).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every doc survives with a dense epoch range 0..n-1
    assert set(by_doc) == {0, 1, 2, 3, 10, 11}
    for eps in by_doc.values():
        assert sorted(eps) == list(range(len(eps)))
    # the largest source's rate is exactly 1.0: exactly one copy each
    for i in range(4):
        assert len(by_doc[i]) == 1
    # srcB rate ~2.83: every doc gets >= floor(rate) = 2 copies, <= 3
    for i in (10, 11):
        assert len(by_doc[i]) in (2, 3)


def test_upsample_deterministic(ray_session, tmp_path):
    d = _mixture_fixture(tmp_path)
    a = sorted(
        (r["doc_id"], r["epoch"]) for r in corpusstats.upsample_mixture_docs(d).take_all()
    )
    b = sorted(
        (r["doc_id"], r["epoch"]) for r in corpusstats.upsample_mixture_docs(d).take_all()
    )
    assert a == b


# --------------------------------------------------- train_val_test_split


def test_split_partition_and_fractions(ray_session, tmp_path):
    n = 4000
    d = _write_docs(tmp_path, [(i, "t", "s") for i in range(n)])
    out = corpusstats.train_val_test_split(d, val_frac=0.1, test_frac=0.1).take_all()
    assert len(out) == n  # every doc assigned exactly once
    counts = {"train": 0, "val": 0, "test": 0}
    for r in out:
        counts[r["split"]] += 1
    # multiplicative hash is roughly uniform: 10% +- 2.5% absolute
    assert abs(counts["val"] / n - 0.1) < 0.025
    assert abs(counts["test"] / n - 0.1) < 0.025
    assert counts["train"] == n - counts["val"] - counts["test"]


def test_split_seeded_and_stable(ray_session, tmp_path):
    d = _write_docs(tmp_path, [(i, "t", "s") for i in range(2000)])

    def grab(seed):
        return {
            r["doc_id"]: r["split"]
            for r in corpusstats.train_val_test_split(d, seed=seed).take_all()
        }

    a, a2, b = grab(7), grab(7), grab(8)
    assert a == a2  # pure function of (doc_id, seed)
    assert a != b  # a different seed reassigns membership
    # membership is per-doc, not positional: dropping docs never moves
    # a surviving doc between splits (no leakage across recrawls)
    d2 = _write_docs(tmp_path, [(i, "t", "s") for i in range(0, 2000, 2)])
    half = {
        r["doc_id"]: r["split"]
        for r in corpusstats.train_val_test_split(d2, seed=7).take_all()
    }
    assert all(a[i] == half[i] for i in half)


# --------------------------------------------------- scrub_blocklist_docs


def test_scrub_masks_whole_words_only(ray_session, tmp_path):
    d = _write_docs(
        tmp_path,
        [
            (0, "slow query on a fast table", "s"),
            (1, "slowest flows fasten", "s"),  # substrings: not whole words
            (2, "clean text here", "s"),
            (3, "slow slow slow", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in textstats.scrub_blocklist_docs(d).take_all()}
    assert out[0]["n_flagged"] == 2
    assert out[0]["clean_text"] == "[SCRUBBED] query on a [SCRUBBED] table"
    assert out[1]["n_flagged"] == 0
    assert out[1]["clean_text"] == "slowest flows fasten"
    assert out[2]["n_flagged"] == 0
    assert out[3]["n_flagged"] == 3
    assert out[3]["clean_text"] == "[SCRUBBED] [SCRUBBED] [SCRUBBED]"


def test_scrub_custom_blocklist(ray_session, tmp_path):
    d = _write_docs(tmp_path, [(0, "alpha beta gamma", "s")])
    out = textstats.scrub_blocklist_docs(
        d, blocklist=("beta",), mask="<X>"
    ).take_all()
    assert out[0]["clean_text"] == "alpha <X> gamma"
    assert out[0]["n_flagged"] == 1


# --------------------------------------------------------- mask_pii_docs


def test_mask_pii_planted_footer(ray_session, tmp_path):
    d = _write_docs(
        tmp_path,
        [
            (0, "plain words only", "s"),
            (12, "more plain words", "s"),
            (9999, "edge of the lpad range", "s"),
        ],
    )
    out = {r["doc_id"]: r for r in textstats.mask_pii_docs(d).take_all()}
    # exactly one planted instance of each PII class per doc
    for r in out.values():
        assert r["n_emails"] == 1
        assert r["n_ips"] == 1
        assert r["n_phones"] == 1
        t = r["masked_text"]
        assert "<EMAIL>" in t and "<IP>" in t and "<PHONE>" in t
        assert "@" not in t  # the email never survives masking
        assert "555-" not in t  # nor the phone
    # the footer is a pure function of doc_id: lpad keeps 4 digits
    assert out[0]["masked_text"].startswith("plain words only contact ")
    assert out[9999]["masked_text"].endswith("<PHONE>")


def test_mask_pii_masks_body_hits_too(ray_session, tmp_path):
    # PII already in the body is masked and counted alongside the footer
    d = _write_docs(
        tmp_path,
        [(5, "mail bob@corp.io or 10.1.2.3 or call 555-1234 now", "s")],
    )
    r = textstats.mask_pii_docs(d).take_all()[0]
    assert r["n_emails"] == 2
    assert r["n_ips"] == 2
    assert r["n_phones"] == 2
    assert "bob@corp.io" not in r["masked_text"]
    assert "10.1.2.3" not in r["masked_text"]
    assert "555-1234" not in r["masked_text"]
