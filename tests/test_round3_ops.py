"""Round-3 operators: range join, exact grouped quantiles, TF-IDF
top-k, regex redaction — each against a brute-force pandas/DuckDB
oracle (SURVEY.md §5 strategy (c))."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pic2vec_ray.stages.quantiles import grouped_quantiles_exact
from pic2vec_ray.stages.text import Redactor, tfidf_topk
from pic2vec_ray.temporal.join import range_join


def _ds(ray_session, df: pd.DataFrame, blocks: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


# --------------------------------------------------------------- range join


def _range_oracle(l, r, key, lts, rts, lo, hi):
    out = l.merge(r, on=key, how="inner")
    return out[(out[rts] >= out[lts] + lo) & (out[rts] < out[lts] + hi)]


def test_range_join_matches_pandas_oracle(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 600
    base = pd.Timestamp("2024-01-01")
    l = pd.DataFrame({
        "k": rng.integers(0, 25, n_l),
        "lid": np.arange(n_l),
        "lts": base + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="min"),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, 25, n_r),
        "rid": np.arange(n_r),
        "rts": base + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="min"),
        "val": rng.normal(size=n_r),
    })
    lo, hi = pd.Timedelta(0), pd.Timedelta(hours=3)
    got = range_join(
        _ds(ray_session, l), _ds(ray_session, r), on="k",
        left_ts="lts", right_ts="rts", min_delta=lo, max_delta=hi,
        num_partitions=8,
    ).to_pandas()
    want = _range_oracle(l, r, "k", "lts", "rts", lo, hi)
    key = ["lid", "rid"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)[got_s.columns]
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=True)
    assert got_s["rid"].dtype == np.int64  # right ints restored post-union


def test_range_join_microsecond_unit_columns(ray_session):
    """Parquet timestamps arrive as datetime64[us] while Timedelta
    arithmetic promotes to [ns]; the window comparison must normalize
    units (regression: mixed units viewed as i8 matched nothing)."""
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01")
    l = pd.DataFrame({
        "k": rng.integers(0, 5, 100),
        "lid": np.arange(100),
        "lts": (base + pd.to_timedelta(rng.integers(0, 5000, 100), unit="min")
                ).astype("datetime64[us]"),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, 5, 150),
        "rid": np.arange(150),
        "rts": (base + pd.to_timedelta(rng.integers(0, 5000, 150), unit="min")
                ).astype("datetime64[us]"),
    })
    lo, hi = pd.Timedelta(0), pd.Timedelta(hours=8)
    got = range_join(
        _ds(ray_session, l, 3), _ds(ray_session, r, 3), on="k",
        left_ts="lts", right_ts="rts", min_delta=lo, max_delta=hi,
        num_partitions=4,
    ).to_pandas()
    want = _range_oracle(l, r, "k", "lts", "rts", lo, hi)
    assert len(want) > 0
    assert sorted(zip(got.lid, got.rid)) == sorted(zip(want.lid, want.rid))


def test_range_join_negative_window_and_clash(ray_session):
    """Window reaching BACK in time; right ts column name clashes with
    the left and must be suffixed."""
    l = pd.DataFrame({
        "k": [1, 1, 2],
        "lid": [0, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00",
                              "2024-01-01 10:00"]),
    })
    r = pd.DataFrame({
        "k": [1, 1, 2],
        "rid": [10, 11, 12],
        "ts": pd.to_datetime(["2024-01-01 09:30", "2024-01-01 11:59",
                              "2024-01-02 10:00"]),
    })
    got = range_join(
        _ds(ray_session, l, 2), _ds(ray_session, r, 2), on="k",
        left_ts="ts", right_ts="ts",
        min_delta=pd.Timedelta(hours=-1), max_delta=pd.Timedelta(0),
        num_partitions=4,
    ).to_pandas().sort_values(["lid", "rid"])
    # lid0 ← rid10 (09:30 ∈ [09:00,10:00)); lid1 ← rid11; lid2: rid12 next day → no
    assert list(zip(got.lid, got.rid)) == [(0, 10), (1, 11)]
    assert "ts_r" in got.columns


def test_range_join_null_keys_never_match(ray_session):
    l = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "lid": [0, 1],
                      "lts": pd.to_datetime(["2024-01-01", "2024-01-01"])})
    r = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "rid": [10, 11],
                      "rts": pd.to_datetime(["2024-01-01", "2024-01-01"])})
    got = range_join(
        _ds(ray_session, l, 1), _ds(ray_session, r, 1), on="k",
        left_ts="lts", right_ts="rts",
        min_delta=pd.Timedelta(days=-1), max_delta=pd.Timedelta(days=1),
        num_partitions=2,
    ).to_pandas()
    assert list(zip(got.lid, got.rid)) == [(0, 10)]


# ---------------------------------------------------------------- quantiles


def test_grouped_quantiles_match_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(list("abc"), 5000),
        "h": rng.integers(0, 2, 5000),
        "v": rng.integers(1, 51, 5000).astype(float),
    })
    got = grouped_quantiles_exact(
        _ds(ray_session, df, 8), keys=["g", "h"], value="v",
        qs=(0.25, 0.5, 0.75, 0.9),
    ).to_pandas().sort_values(["g", "h"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT g, h, quantile_disc(v, 0.25) q25, quantile_disc(v, 0.5) q50,
               quantile_disc(v, 0.75) q75, quantile_disc(v, 0.9) q90,
               COUNT(*) n_rows
        FROM t GROUP BY g, h ORDER BY g, h
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_grouped_quantiles_skewed_counts(ray_session):
    """Heavily repeated values (the value-count path's whole point):
    rank selection must honor multiplicities, not distinct positions."""
    df = pd.DataFrame({"g": ["x"] * 100, "v": [1.0] * 97 + [50.0] * 3})
    got = grouped_quantiles_exact(
        _ds(ray_session, df, 3), keys="g", value="v", qs=(0.5, 0.97, 0.98),
    ).to_pandas().iloc[0]
    assert got["q50"] == 1.0 and got["q97"] == 1.0 and got["q98"] == 50.0
    assert got["n_rows"] == 100


# ------------------------------------------------------------------- tf-idf


def test_tfidf_topk_matches_bruteforce(ray_session):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "apple banana apple cherry",
            "banana banana date",
            "apple date date date egg",
            "fig fig fig fig",
        ],
    })
    n = len(docs)
    got = tfidf_topk(_ds(ray_session, docs, 2), n, k=2,
                     num_partitions=4).to_pandas()
    # brute force
    rows = []
    tok_docs = docs.text.str.lower().str.findall(r"[a-z0-9]+")
    df_counts = {}
    for toks in tok_docs:
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
    for did, toks in zip(docs.doc_id, tok_docs):
        tf = pd.Series(toks).value_counts()
        scored = sorted(
            ((round(c * math.log(n / df_counts[t]), 6), t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:2]
        rows += [(did, t, c, s) for s, t, c in scored]
    want = pd.DataFrame(rows, columns=["doc_id", "token", "tf", "tfidf"])
    got_s = got.sort_values(["doc_id", "token"]).reset_index(drop=True)
    want_s = want.sort_values(["doc_id", "token"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[want_s.columns], want_s, check_dtype=False)


# ---------------------------------------------------------------- redaction


def test_redactor_sequential_rules_and_counts():
    batch = pd.DataFrame({"text": ["call me maybe", "abc abc", "none here"]})
    red = Redactor([(r"abc", "x"), (r"x+", "[X]")])
    out = red(batch.copy())
    # rule 2 sees rule 1's output: "abc abc" -> "x x" -> "[X] [X]"
    assert out.text_redacted.tolist() == ["call me maybe", "[X] [X]", "none here"]
    assert out.n_redactions.tolist() == [0, 4, 0]  # 2 abc + 2 x-runs


# ------------------------------------------------- pack / stratified sample


def _brute_pack(tokens, budget):
    pack, acc, p = [], 0, 0
    for t in tokens:
        if acc + t > budget and acc > 0:
            p, acc = p + 1, 0
        acc += t
        pack.append(p)
    return pack


def test_pack_sequences_matches_bruteforce(ray_session):
    from pic2vec_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(400),
        "grp": rng.integers(0, 5, 400),
        "nt": rng.integers(1, 90, 400).astype("int64"),
    })
    # one oversized doc per group: must sit in a pack of its own
    df.loc[df.groupby("grp").head(1).index, "nt"] = 500
    got = pack_sequences(_ds(ray_session, df), group_col="grp",
                         id_col="doc_id", token_col="nt", budget=120,
                         num_partitions=8).to_pandas()
    got = got.sort_values(["grp", "doc_id"]).reset_index(drop=True)
    for g, sub in got.groupby("grp"):
        want = _brute_pack(sub.sort_values("doc_id").nt.tolist(), 120)
        assert sub.sort_values("doc_id").pack_id.tolist() == want
        # every pack except possibly singletons respects the budget
        sums = sub.groupby("pack_id").nt.sum()
        counts = sub.groupby("pack_id").nt.size()
        assert ((sums <= 120) | (counts == 1)).all()


def test_stratified_sample_partition_invariant(ray_session):
    from pic2vec_ray.stages.pack import stratified_sample

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "doc_id": rng.permutation(300),
        "grp": np.repeat(np.arange(6), 50),
    })
    a = stratified_sample(_ds(ray_session, df, 2), group_col="grp",
                          id_col="doc_id", n=7, num_partitions=4).to_pandas()
    b = stratified_sample(_ds(ray_session, df.sample(frac=1, random_state=1), 9),
                          group_col="grp", id_col="doc_id", n=7,
                          num_partitions=16).to_pandas()
    key = ["grp", "doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
    )
    assert (a.groupby("grp").size() == 7).all()


def test_stratified_sample_small_group_keeps_all(ray_session):
    from pic2vec_ray.stages.pack import stratified_sample

    df = pd.DataFrame({"doc_id": np.arange(10), "grp": [0] * 3 + [1] * 7})
    out = stratified_sample(_ds(ray_session, df, 2), group_col="grp",
                            id_col="doc_id", n=5, num_partitions=4).to_pandas()
    assert out.groupby("grp").size().to_dict() == {0: 3, 1: 5}


# ----------------------------------------------------------- quantile bins


def test_quantile_bin_matches_duckdb(ray_session):
    import duckdb

    from pic2vec_ray.stages.quantiles import quantile_bin

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "id": np.arange(500),
        "v": np.round(rng.lognormal(3.0, 1.0, 500), 2),
    })
    got = (quantile_bin(_ds(ray_session, df), value="v", n_bins=10)
           .to_pandas().sort_values("id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH e AS (SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges FROM t)
        SELECT id, v, len(list_filter(e.edges, x -> v > x)) AS bin
        FROM t, e ORDER BY id
    """).df()
    assert (got["bin"].to_numpy() == exp["bin"].to_numpy()).all()
    # equal-frequency: every decile holds ~n/10 rows on a continuous-ish domain
    sizes = got.groupby("bin").size()
    assert sizes.min() >= 40 and sizes.max() <= 60


def test_quantile_bin_skew_duplicate_edges_and_validation(ray_session):
    from pic2vec_ray.stages.quantiles import quantile_bin

    # 90% of mass on one value: most decile edges coincide -> empty bins,
    # ties land in the LOWER bin, max bin still reachable
    df = pd.DataFrame({"id": np.arange(200),
                       "v": np.r_[np.full(180, 5.0), np.linspace(6, 10, 20)]})
    for blocks in (1, 7):
        got = (quantile_bin(_ds(ray_session, df, blocks), value="v", n_bins=10)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert (got.loc[got.v == 5.0, "bin"] == 0).all()
        assert got["bin"].max() == 9
        assert got["bin"].min() == 0

    with pytest.raises(ValueError):
        quantile_bin(_ds(ray_session, df), value="v", n_bins=1)


# ------------------------------------------------------- encoding / scaling


def test_standardize_matches_numpy_and_partition_invariance(ray_session):
    from pic2vec_ray.stages.encode import standardize

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"id": np.arange(400),
                       "v": np.round(rng.normal(50, 12, 400), 2)})
    m = round(df.v.to_numpy().mean(), 6)
    sd = round(df.v.to_numpy().std(), 6)
    exp = np.round((df.v.to_numpy() - m) / sd, 6)

    for blocks in (1, 7):
        got = (standardize(_ds(ray_session, df, blocks), value="v")
               .to_pandas().sort_values("id"))
        assert (got["v_z"].to_numpy() == exp).all()

    with pytest.raises(ValueError):
        standardize(_ds(ray_session, df.assign(v=1.0)), value="v").take_all()


def test_target_encode_matches_pandas(ray_session):
    from pic2vec_ray.stages.encode import target_encode

    rng = np.random.default_rng(37)
    df = pd.DataFrame({
        "id": np.arange(300),
        "cat": rng.choice(["a", "b", "c", "d"], 300),
        "y": np.round(rng.uniform(0, 100, 300), 2),
    })
    exp = df.cat.map(df.groupby("cat")["y"].mean().round(6))
    for blocks in (1, 5):
        got = (target_encode(_ds(ray_session, df, blocks), key="cat", target="y")
               .to_pandas().sort_values("id"))
        assert (got["cat_te"].to_numpy() == exp.to_numpy()).all()


def test_grouped_mode_pinned_tiebreak(ray_session):
    from pic2vec_ray.stages.quantiles import grouped_mode

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 4,
        "v": [3, 3, 1, 1, 2, 9,      # a: tie 3 vs 1 (2 each) -> min value 1
              7, 7, 7, 5],           # b: clear mode 7 (x3)
    })
    for blocks in (1, 5):
        got = (grouped_mode(_ds(ray_session, df, blocks), keys="k", value="v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        assert got.mode_v.tolist() == [1, 7]
        assert got.mode_count.tolist() == [2, 3]


def test_unpivot_matches_melt_and_roundtrips_pivot(ray_session):
    from pic2vec_ray.stages.relational import pivot_sum, unpivot

    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "uid": np.repeat(np.arange(20), 5),
        "typ": rng.choice(["x", "y", "z"], 100),
        "val": np.round(rng.uniform(0, 10, 100), 2),
    })
    wide = (pivot_sum(_ds(ray_session, df), key="uid", pivot_col="typ",
                      value="val", categories=["x", "y", "z"])
            .to_pandas())
    long = (unpivot(_ds(ray_session, wide, 3), id_cols=["uid"],
                    value_cols=["x_sum", "y_sum", "z_sum"])
            .to_pandas().sort_values(["uid", "variable"]).reset_index(drop=True))
    exp = (wide.melt(id_vars=["uid"], value_vars=["x_sum", "y_sum", "z_sum"])
           .sort_values(["uid", "variable"]).reset_index(drop=True))
    assert (long.uid.to_numpy() == exp.uid.to_numpy()).all()
    assert long.variable.tolist() == exp.variable.tolist()
    assert np.allclose(long.value.to_numpy(), exp.value.to_numpy())
    # melt(pivot(x)) recovers every per-(uid, typ) sum
    back = long.set_index(["uid", "variable"]).value
    for (uid, typ), s in df.groupby(["uid", "typ"]).val.sum().items():
        assert np.isclose(back[(uid, f"{typ}_sum")], s)

    with pytest.raises(ValueError):
        unpivot(_ds(ray_session, wide), id_cols=["uid"], value_cols=[])


def test_string_agg_ordered_and_partition_invariant(ray_session):
    from pic2vec_ray.stages.relational import string_agg

    rng = np.random.default_rng(59)
    n = 300
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "ts": rng.permutation(n),          # scrambled order column
        "id": np.arange(n),
        "v": rng.choice(list("abcde"), n),
    })
    exp = (df.sort_values(["ts", "id"]).groupby("k")["v"]
           .agg(",".join).rename("v_agg").reset_index()
           .sort_values("k").reset_index(drop=True))
    for blocks in (1, 6):
        got = (string_agg(_ds(ray_session, df, blocks), by="k", value="v",
                          order=["ts", "id"], num_partitions=5)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rollup_sum_matches_duckdb(ray_session):
    import duckdb

    from pic2vec_ray.stages.relational import rollup_sum

    rng = np.random.default_rng(67)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 200),
        "b": rng.choice(["p", "q", "r"], 200),
        "c": rng.choice(["m", "n"], 200),
        "v": rng.integers(0, 100, 200),
    })
    got = (rollup_sum(_ds(ray_session, df, 5), keys=["a", "b", "c"], value="v")
           .to_pandas())
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT a, b, c, SUM(v) AS sum_v, COUNT(*) AS n_rows
        FROM t GROUP BY ROLLUP (a, b, c)
    """).df()

    canon = lambda d: sorted(
        ("" if pd.isna(a) else a, "" if pd.isna(b) else b,
         "" if pd.isna(c) else c, int(s), int(n))
        for a, b, c, s, n in d[["a", "b", "c", "sum_v", "n_rows"]]
        .itertuples(index=False))
    assert canon(got) == canon(exp)
    assert len(got) == len(exp)
    with pytest.raises(ValueError):
        rollup_sum(_ds(ray_session, df), keys=[], value="v")


def test_distinct_users_and_session_stats_vs_pandas(ray_session, sf_dir):
    import ray.data as rd

    from pic2vec_ray.pipelines.queries import (
        distinct_users_per_type,
        session_stats,
    )

    got = (distinct_users_per_type(sf_dir)  # returns a pandas DataFrame
           .sort_values("event_type").reset_index(drop=True))
    pdf = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "user_id", "ts", "value",
                                   "event_id"]).to_pandas()
    exp = (pdf.groupby("event_type")["user_id"].nunique()
           .rename("n_users").reset_index())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    ss = session_stats(sf_dir).to_pandas()
    # session count equals sessionize's max session id summed per user
    o = pdf.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    gap = pd.Timedelta(minutes=30)
    prev = o.groupby("user_id", sort=False)["ts"].shift(1)
    o["sid"] = ((prev.isna() | ((o.ts - prev) > gap))
                .groupby(o.user_id, sort=False).cumsum())
    exp_n = o.groupby(["user_id", "sid"]).agg(
        n=("event_id", "size"), s=("value", "sum"),
        t0=("ts", "min"), t1=("ts", "max"))
    exp_n.index = exp_n.index.set_names(["user_id", "session_id"])
    assert len(ss) == len(exp_n)
    assert ss.n_events.sum() == len(pdf)
    m = ss.set_index(["user_id", "session_id"]).join(exp_n)
    assert (m.n_events == m.n).all()
    assert np.allclose(m.sum_value, m.s.round(6))
    assert np.allclose(m.span_sec, (m.t1 - m.t0).dt.total_seconds().round(6))
