"""Round-4 sixth batch: Benford digit audit, temporal volume drift,
cross-table control-total reconciliation, lexical diversity, script
mix, dedup yield report, null co-occurrence, language confusion,
mixture planner, token fertility, caption dupes, byte outliers."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_benford_constants_pin_float_meaning():
    # the e6 constants are frozen log10(1 + 1/d); pin the FLOAT meaning
    # so a stray scale factor can't hide on both sides of the oracle
    from schisma_ray.stages.stats import BENFORD_P_E6

    for d, p in zip(range(1, 10), BENFORD_P_E6):
        assert p == round(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(BENFORD_P_E6) == 1_000_000


def test_benford_digits_bruteforce(ray_session):
    from schisma_ray.stages.stats import BENFORD_P_E6, benford_digits

    rng = np.random.default_rng(3)
    # log-uniform positive values + nulls + non-positives (excluded)
    vals = list(10.0 ** rng.uniform(-1, 4, 300)) + [None, 0.0, -5.0]
    t = pa.table({"v": pa.array(vals, pa.float64())})
    out = benford_digits(
        rd.from_arrow(t).repartition(4), "v"
    ).to_pandas().set_index("digit")

    cents = np.floor(np.array(vals[:300]) * 100.0 + 0.5).astype(np.int64)
    cents = cents[cents > 0]
    first = np.array([int(str(c)[0]) for c in cents])
    total = len(first)
    for d in range(1, 10):
        n_obs = int((first == d).sum())
        assert out.loc[d, "n_obs"] == n_obs
        exp = total * BENFORD_P_E6[d - 1]
        assert out.loc[d, "expected_e6"] == exp
        # chi2 term is the e6-scaled float value (pin the SCALE, not
        # just both-sides agreement — the gate can't see a factor
        # mirrored into the oracle)
        want = 1e6 * ((n_obs - exp / 1e6) ** 2) / (exp / 1e6)
        assert abs(out.loc[d, "chi2_term_e6"] - want) <= 1.0

    empty = benford_digits(
        rd.from_arrow(pa.table({"v": pa.array([], pa.float64())})), "v"
    ).to_pandas()
    assert len(empty) == 9 and empty["n_obs"].sum() == 0
    assert (empty["chi2_term_e6"] == 0).all()


def test_lexical_diversity_bruteforce(ray_session):
    from schisma_ray.stages.text import lexical_diversity

    docs = {
        1: "a b a c a",          # words=5 distinct=3 hapax=2 (b, c)
        2: "x x x x",            # words=4 distinct=1 hapax=0
        3: "  spaced   out  ",   # words=2 distinct=2 hapax=2
        4: "",                   # dropped
        5: None,                 # dropped
        6: "word",               # words=1 distinct=1 hapax=1 ttr=1e6
    }
    t = pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })
    out = lexical_diversity(
        rd.from_arrow(t).repartition(3)
    ).to_pandas().set_index("doc_id")
    assert set(out.index) == {1, 2, 3, 6}
    assert tuple(out.loc[1, ["n_words", "n_distinct", "n_hapax"]]) == (5, 3, 2)
    assert tuple(out.loc[2, ["n_words", "n_distinct", "n_hapax"]]) == (4, 1, 0)
    assert tuple(out.loc[3, ["n_words", "n_distinct", "n_hapax"]]) == (2, 2, 2)
    assert out.loc[6, "ttr_e6"] == 1_000_000
    # half-up integer divide: 3/5 -> 600000, 1/4 -> 250000
    assert out.loc[1, "ttr_e6"] == 600_000
    assert out.loc[2, "ttr_e6"] == 250_000


def test_script_mix_counts_and_dominance(ray_session):
    from schisma_ray.stages.text import script_mix

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "Hello 99",          # latin 5, digit 2, space 1
            "Привет мир",        # cyrillic 9, space 1
            "你好 ab",            # cjk 2, latin 2, space 1 -> tie latin? no: cjk=2, latin=2 -> first-max order puts latin first
            None,                # all zero -> 'latin' by first-max
            "....",              # other 4
        ], pa.string()),
    })
    out = script_mix(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert tuple(out.loc[1, ["n_latin", "n_digit", "n_space"]]) == (5, 2, 1)
    assert out.loc[1, "dominant"] == "latin"
    assert out.loc[2, "n_cyrillic"] == 9
    assert out.loc[2, "dominant"] == "cyrillic"
    # latin ties cjk at 2 -> latin listed first wins
    assert out.loc[3, "n_cjk"] == 2 and out.loc[3, "n_latin"] == 2
    assert out.loc[3, "dominant"] == "latin"
    assert out.loc[4, "dominant"] == "latin"  # empty: all-zero tie
    assert out.loc[5, "n_other"] == 4 and out.loc[5, "dominant"] == "other"


def test_order_totals_reconcile_catalog(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from schisma_ray.pipelines.catalog import QUERIES

    # orders: 1 reconciles, 2 differs, 3 has no lineitems
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([30.00, 10.00, 7.50], pa.float64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.00, 20.00, 9.99], pa.float64()),
    }), tmp_path / "lineitem.parquet")

    out = QUERIES["order_totals_reconcile"](str(tmp_path)).to_pandas()
    out = out.set_index("o_orderkey").sort_index()
    assert out.loc[1, "matched"] and out.loc[1, "diff_cents"] == 0
    assert not out.loc[2, "matched"] and out.loc[2, "diff_cents"] == 1
    assert out.loc[3, "line_cents"] == 0 and out.loc[3, "diff_cents"] == 750


def test_volume_drift_bruteforce(ray_session):
    import pandas as pd

    from schisma_ray.stages.stats import volume_drift

    # key 'a': balanced; 'b': second half doubles; 'c': only second half
    ts, key = [], []
    base = 1_700_000_000_000_000  # us epoch
    for i in range(40):
        ts.append(base + i * 1_000_000)
        key.append("a")
    for i in range(10):
        ts.append(base + i * 1_000_000)
        key.append("b")
    for i in range(20):
        ts.append(base + 30_000_000 + i * 500_000)
        key.append("b")
    for i in range(5):
        ts.append(base + 35_000_000 + i * 100_000)
        key.append("c")
    ts.append(None)
    key.append("a")
    t = pa.table({
        "ts": pa.array(
            pd.to_datetime(ts, unit="us"), pa.timestamp("us")
        ),
        "k": pa.array(key, pa.string()),
    })
    out = volume_drift(
        rd.from_arrow(t).repartition(3), "ts", "k"
    ).to_pandas().set_index("k")

    us = np.array([x for x in ts if x is not None], np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    for k in ("a", "b", "c"):
        mask = np.array([kk == k and tt is not None
                         for kk, tt in zip(key, ts)])
        vals = np.array([tt for kk, tt in zip(key, ts)
                         if kk == k and tt is not None], np.int64)
        nf = int((vals < mid).sum())
        nsec = int((vals >= mid).sum())
        assert out.loc[k, "n_first"] == nf
        assert out.loc[k, "n_second"] == nsec
        if nf > 0:
            assert out.loc[k, "ratio_e6"] == (
                2 * nsec * 1_000_000 + nf) // (2 * nf)
        else:
            assert out.loc[k, "ratio_e6"] == -1 and out.loc[k, "drifted"]
    assert out.loc["c", "drifted"]

    empty = volume_drift(
        rd.from_arrow(t.slice(0, 0)), "ts", "k")
    assert empty.num_rows == 0


def test_dedup_yield_report_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from schisma_ray.pipelines.catalog import QUERIES

    # 3 identical docs (one size-3 cluster), 2 identical (size-2),
    # 3 unique docs (not reported)
    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six seven"] * 2
             + ["totally different words here now",
                "another unique document text body",
                "yet more unrelated content lives"])
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), tmp_path / "documents.parquet")

    out = QUERIES["dedup_yield_report"](str(tmp_path))
    df = out.to_pandas().set_index("cluster_size").sort_index()
    assert df.loc[2, "n_clusters"] == 1 and df.loc[2, "docs_removed"] == 1
    assert df.loc[3, "n_clusters"] == 1 and df.loc[3, "docs_removed"] == 2

    # no duplicates at all -> empty report with stable schema
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb cc dd", "ee ff gg hh"], pa.string()),
    }), tmp_path / "documents.parquet")
    empty = QUERIES["dedup_yield_report"](str(tmp_path))
    assert empty.num_rows == 0
    assert empty.schema.names == ["cluster_size", "n_clusters",
                                  "docs_removed"]


def test_null_cooccurrence_bruteforce(ray_session):
    from schisma_ray.stages.profile import null_cooccurrence

    a = [None, None, 1, 2, None, 3, 4, None]
    b = [None, 5, None, 6, None, 7, 8, None]
    c = [9, 10, 11, 12, 13, 14, 15, 16]  # no nulls
    t = pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64()),
        "c": pa.array(c, pa.int64()),
    })
    out = null_cooccurrence(
        rd.from_arrow(t).repartition(3), ["a", "b", "c"]
    ).to_pandas().set_index(["col_a", "col_b"])
    # a nulls: 4, b nulls: 4, both: 3 -> union 5 -> jaccard 600000
    r = out.loc[("a", "b")]
    assert (r.n_a_null, r.n_b_null, r.n_both_null) == (4, 4, 3)
    assert r.jaccard_e6 == 600_000
    # c has no nulls -> union with a is 4, both 0
    r = out.loc[("a", "c")]
    assert (r.n_a_null, r.n_b_null, r.n_both_null) == (4, 0, 0)
    assert r.jaccard_e6 == 0
    # all-null-free pair -> union 0 -> defined as 0
    t2 = pa.table({"x": pa.array([1, 2], pa.int64()),
                   "y": pa.array([3, 4], pa.int64())})
    out2 = null_cooccurrence(rd.from_arrow(t2), ["x", "y"]).to_pandas()
    assert out2.iloc[0].jaccard_e6 == 0


def test_lang_confusion_matches_mismatch_rows(ray_session):
    from schisma_ray.pipelines.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    conf = QUERIES["lang_confusion"](sf).to_pandas()
    mism = QUERIES["lang_mismatches"](sf).to_pandas()
    # confusion totals must equal the corpus size, and the off-diagonal
    # mass must equal the row-level mismatch audit's row count
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert conf["n"].sum() == n_docs
    off = conf[conf["lang"] != conf["lang_pred"]]["n"].sum()
    assert off == len(mism)


def test_mixture_plan_bruteforce(ray_session):
    from schisma_ray.stages.corpus import mixture_plan

    t = pa.table({
        "lang": pa.array(["en", "en", "de", None], pa.string()),
        "tok": pa.array([100, 200, 50, 999], pa.int64()),
    })
    out = mixture_plan(
        rd.from_arrow(t).repartition(2), "lang", "tok",
        {"en": 600_000, "de": 300_000, "ko": 100_000}, 1000,
    ).to_pandas().set_index("key")
    # en: have 300, target 600 -> repeat 2e6; de: have 50, target 300 ->
    # repeat 6e6; ko: have 0 -> unsatisfiable
    assert out.loc["en", "n_tokens"] == 300
    assert out.loc["en", "target_tokens"] == 600
    assert out.loc["en", "repeat_e6"] == 2_000_000
    assert out.loc["de", "repeat_e6"] == 6_000_000
    assert out.loc["ko", "n_tokens"] == 0
    assert out.loc["ko", "repeat_e6"] == -1
    # null keys dropped entirely (999 appears nowhere)
    assert out["n_tokens"].sum() == 350


def test_token_fertility_bruteforce(ray_session):
    from schisma_ray.stages.text import token_fertility

    t = pa.table({
        "lang": pa.array(["en", "en", "zh", None], pa.string()),
        "text": pa.array(["ab cd", "xyz", "你好", "dropped"], pa.string()),
    })
    out = token_fertility(
        rd.from_arrow(t).repartition(2)
    ).to_pandas().set_index("lang")
    # en: bytes 5+3=8, tokens 2+1=3 -> 8/3 e6 half-up = 2666667
    assert out.loc["en", "n_bytes"] == 8
    assert out.loc["en", "n_tokens"] == 3
    assert out.loc["en", "bytes_per_token_e6"] == 2_666_667
    # zh: 6 utf-8 bytes, 1 token
    assert out.loc["zh", "n_bytes"] == 6
    assert out.loc["zh", "bytes_per_token_e6"] == 6_000_000
    assert len(out) == 2


def test_caption_dupes_and_bytes_outliers(ray_session):
    from schisma_ray.pipelines.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    dup = QUERIES["caption_dupes"](sf).to_pandas()
    assert list(dup.columns) == ["caption", "n"]
    assert (dup["n"] >= 2).all()

    out = QUERIES["image_bytes_outliers"](sf).to_pandas()
    assert set(out.columns) == {"image_id", "fmt", "z"}
    assert (out["z"].abs() >= 2.5).all()
    assert len(out) > 0


def test_prepare_corpus_classifier_filter(ray_session):
    import pyarrow.parquet as pq

    from schisma_ray.pipelines.catalog import _t, _word_classifier_file
    from schisma_ray.pipelines.corpus_pipeline import prepare_corpus

    sf = "/root/testdata/sf0.001"
    docs = _t(sf, "documents")
    model = pq.read_table(_word_classifier_file(sf))
    base = prepare_corpus(
        docs, langs=("en",), min_quality=0.5,
        chunk_size=80, chunk_stride=60,
    ).to_pandas()
    clf = prepare_corpus(
        docs, classifier_model=model, min_classifier_e6=0,
        langs=("en",), min_quality=0.5, chunk_size=80, chunk_stride=60,
    ).to_pandas()
    # the model filter strictly shrinks the output and keeps a subset
    assert 0 < clf["doc_id"].nunique() < base["doc_id"].nunique()
    assert set(clf["doc_id"]) <= set(base["doc_id"])
    # a stricter threshold shrinks it further (monotone)
    strict = prepare_corpus(
        docs, classifier_model=model, min_classifier_e6=1_000_000,
        langs=("en",), min_quality=0.5, chunk_size=80, chunk_stride=60,
    ).to_pandas()
    assert set(strict["doc_id"]) <= set(clf["doc_id"])


def test_conform_repair_summary(ray_session):
    from schisma_ray.pipelines.catalog import QUERIES

    out = QUERIES["conform_repair_summary"](
        "/root/testdata/sf0.001"
    ).to_pandas().set_index("column")
    assert set(out.index) == {"w", "h", "fmt", "caption", "phash"}
    # seeded defects guarantee every column has repairs at sf0.001
    assert (out["n_repaired"] > 0).all()
    # and conform never rewrites the whole table
    assert (out["n_repaired"] < 1500).all()
