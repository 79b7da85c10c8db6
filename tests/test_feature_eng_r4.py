"""Round-4 feature-engineering additions: count encoding, hashed
feature crosses, calendar features, k-fold assignment, RFM features,
mutual information, count-based Spearman, signed feature hashing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _cats(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.normal(10.0, 2.0, n).round(2),
    })


def test_count_encode_matches_value_counts(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import count_encode

    df = _cats()
    out = (count_encode(rd.from_pandas(df).repartition(5), key="a")
           .to_pandas().sort_values("id").reset_index(drop=True))
    vc = df.a.value_counts()
    expect = df.a.map(vc).to_numpy()
    assert (out.a_count.to_numpy() == expect).all()
    assert out.a_count.dtype == np.int64


def test_cross_hash_encode_is_tuple_hash(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import _horner64, cross_hash_encode

    df = _cats()
    out = (cross_hash_encode(rd.from_pandas(df).repartition(4),
                             keys=["a", "b"], n_buckets=16)
           .to_pandas().sort_values("id").reset_index(drop=True))
    col = "a_x_b_bucket"
    expect = [(_horner64(f"{a}\x1f{b}") % 16) for a, b in zip(df.a, df.b)]
    assert out[col].tolist() == expect
    # the cross distinguishes tuples that share one component
    assert out[col].nunique() > df.a.nunique()


def test_date_features_matches_pandas(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import date_features

    ts = pd.date_range("2024-03-30 21:15:00", periods=200, freq="137min")
    df = pd.DataFrame({"id": np.arange(200, dtype=np.int64), "ts": ts})
    out = (date_features(rd.from_pandas(df).repartition(3), ts="ts")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert (out.ts_year.to_numpy() == ts.year.to_numpy()).all()
    assert (out.ts_month.to_numpy() == ts.month.to_numpy()).all()
    assert (out.ts_isodow.to_numpy() == (ts.dayofweek + 1).to_numpy()).all()
    assert (out.ts_hour.to_numpy() == ts.hour.to_numpy()).all()
    # cyclic encoding: unit circle (up to the 6dp rounding contract)
    r = out.ts_hour_sin ** 2 + out.ts_hour_cos ** 2
    assert np.allclose(r, 1.0, atol=1e-5)


def test_kfold_assign_balanced_and_decorrelated(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.split import hash_split, kfold_assign

    df = pd.DataFrame({"id": np.arange(5000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(6)
    out = (kfold_assign(ds, id_col="id", k=5)
           .to_pandas().sort_values("id").reset_index(drop=True))
    sizes = out.fold.value_counts()
    assert set(out.fold.unique()) == set(range(5))
    assert sizes.max() / sizes.min() < 1.3
    # folds cut across the train/valid/test split, not mirror it
    sp = (hash_split(ds, id_col="id").to_pandas()
          .sort_values("id").reset_index(drop=True))
    joint = pd.crosstab(out.fold, sp.split)
    assert (joint > 0).all().all()
    with pytest.raises(ValueError):
        kfold_assign(ds, id_col="id", k=1)


def test_rfm_features_match_pandas(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.relational import rfm_features

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "user": rng.integers(0, 40, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
        "value": rng.uniform(1, 50, n).round(2),
    })
    out = (rfm_features(rd.from_pandas(df).repartition(5), id_col="user",
                        ts="ts", value="value", num_partitions=4)
           .to_pandas().sort_values("user").reset_index(drop=True))
    gmax = df.ts.max()
    ref = df.groupby("user").agg(frequency=("value", "size"),
                                 monetary=("value", "sum"),
                                 last=("ts", "max")).reset_index()
    assert (out.frequency.to_numpy() == ref.frequency.to_numpy()).all()
    assert np.allclose(out.monetary, ref.monetary.round(2))
    expect_us = ((gmax - ref["last"]) // pd.Timedelta(microseconds=1))
    assert (out.recency_us.to_numpy() == expect_us.to_numpy()).all()


def test_mutual_information_known_values(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.featsel import mutual_information

    # perfectly dependent: MI == H(X) == H(Y) == ln 2
    df = pd.DataFrame({"x": ["a", "b"] * 500, "y": ["u", "v"] * 500})
    out = mutual_information(rd.from_pandas(df).repartition(4), x="x", y="y")
    assert out.mi_nats[0] == pytest.approx(np.log(2), abs=1e-6)
    assert out.h_x[0] == pytest.approx(np.log(2), abs=1e-6)
    # independent: MI == 0
    rng = np.random.default_rng(5)
    df2 = pd.DataFrame({"x": np.repeat(["a", "b"], 500),
                        "y": np.tile(["u", "v"], 500)})
    out2 = mutual_information(rd.from_pandas(df2).repartition(3),
                              x="x", y="y")
    assert abs(out2.mi_nats[0]) < 1e-9
    assert out2.n_rows[0] == 1000


def test_spearman_counts_matches_pandas_rank_corr(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.featsel import spearman_counts

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["A", "B"], n),
        "x": rng.integers(1, 20, n),
    })
    # y correlated with x in A, anti-correlated in B (ties everywhere)
    noise = rng.integers(-3, 4, n)
    df["y"] = np.where(df.g == "A", df.x + noise, 20 - df.x + noise)
    out = spearman_counts(rd.from_pandas(df).repartition(6),
                          by="g", x="x", y="y")
    for _, row in out.iterrows():
        grp = df[df.g == row.g]
        ref = grp.x.rank().corr(grp.y.rank())  # average-rank Pearson
        assert row.spearman == pytest.approx(ref, abs=1e-6)
    assert out.loc[out.g == "A", "spearman"].iloc[0] > 0.8
    assert out.loc[out.g == "B", "spearman"].iloc[0] < -0.8


def test_hash_vectorize_matches_bruteforce(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import _horner64
    from pic2vec_ray.stages.text import hash_vectorize

    docs = ["the cat sat", "a dog! A DOG", "", "cat 42 cat"]
    df = pd.DataFrame({"text": docs})
    D = 32
    out = (hash_vectorize(rd.from_pandas(df).repartition(3), n_dims=D)
           .to_pandas().sort_values("dim").reset_index(drop=True))
    ref: dict[int, list[int]] = {}
    import re
    for t in docs:
        for tok in re.findall(r"[a-z0-9]+", t.lower()):
            h = _horner64(tok)
            d, s = h % D, 1 if (h // D) % 2 == 0 else -1
            acc = ref.setdefault(d, [0, 0])
            acc[0] += s
            acc[1] += 1
    assert dict(zip(out.dim, out.signed_sum)) == {d: v[0] for d, v in ref.items()}
    assert dict(zip(out.dim, out.n_tokens)) == {d: v[1] for d, v in ref.items()}
    assert int(out.n_tokens.sum()) == 10


def test_exact_dup_edges_and_crossmodal_merge(ray_session):
    """Star edges from exact text dups + embedding pairs merge into one
    component only via the union of BOTH modalities."""
    import ray.data as rd
    from pic2vec_ray.stages.dedup import (embedding_neardup_pairs,
                                          exact_dup_edges, neardup_groups)

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5], dtype=np.int64),
        "text": ["same text", "Same  TEXT", "other", "unrelated", "third"],
    })
    t_edges = (exact_dup_edges(rd.from_pandas(docs).repartition(3),
                               num_partitions=4)
               .to_pandas().sort_values(["id_a", "id_b"]))
    # 1 and 2 are exact dups after normalization; star edge (1, 2)
    assert t_edges.values.tolist() == [[1, 2]]

    v = np.eye(8, dtype=np.float32)
    emb = pd.DataFrame({
        "vec_id": np.array([2, 3, 4, 5], dtype=np.int64),
        "embedding": [v[0], v[0], v[1], v[2]],  # 2 ~ 3 only
    })
    e_pairs = embedding_neardup_pairs(rd.from_pandas(emb), threshold=0.95,
                                      mode="exact")
    e_pairs = e_pairs.map_batches(lambda df: df[["id_a", "id_b"]],
                                  batch_format="pandas")
    t_edges_ds = rd.from_pandas(t_edges.reset_index(drop=True))
    groups = (neardup_groups(t_edges_ds.union(e_pairs), num_partitions=4)
              .to_pandas().sort_values("id").reset_index(drop=True))
    # {1,2} via text, {2,3} via embedding -> one component {1,2,3}
    assert dict(zip(groups.id, groups.group_id)) == {1: 1, 2: 1, 3: 1}


def test_box_features_match_manual(ray_session):
    import ray.data as rd
    from pic2vec_ray.codecs.png import encode_png
    from pic2vec_ray.stages.decode import make_box_features_fn

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    tbl = pd.DataFrame({"image_id": ["a", "bad"],
                        "bytes": [encode_png(img), b"junk"]})
    out = (rd.from_pandas(tbl)
           .map_batches(make_box_features_fn(), batch_format="pyarrow")
           .to_pandas())
    assert out.image_id.tolist() == ["a"]  # junk row drops
    assert bool(out.box_ok[0])
    inten = img.astype(np.int64).sum(axis=2)
    left, right = inten[:, :3].sum(), inten[:, 3:].sum()
    top, bottom = inten[:5, :].sum(), inten[5:, :].sum()
    assert out.haar_h[0] == left - right
    assert out.haar_v[0] == top - bottom


def test_pca_project_by_groups_independent(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.similarity import pca_project, pca_project_by

    rng = np.random.default_rng(31)
    # group A varies along axis 0, group B along axis 1
    a = np.zeros((300, 4)); a[:, 0] = rng.normal(0, 5, 300); a += rng.normal(0, .1, (300, 4))
    b = np.zeros((300, 4)); b[:, 1] = rng.normal(0, 5, 300); b += rng.normal(0, .1, (300, 4))
    df = pd.DataFrame({"g": ["A"] * 300 + ["B"] * 300,
                       "embedding": list(np.vstack([a, b]))})
    out, fits = pca_project_by(rd.from_pandas(df).repartition(5),
                               by="g", dim_out=1)
    compA, compB = fits["A"][0][:, 0], fits["B"][0][:, 0]
    assert abs(compA[0]) > 0.99 and abs(compB[1]) > 0.99
    # per-group projection equals a single-group PCA run on that group
    solo, _ = pca_project(rd.from_pandas(df[df.g == "A"].reset_index(drop=True)),
                          dim_out=1)
    got = (out.to_pandas().query("g == 'A'").pca
           .map(lambda v: v[0]).to_numpy())
    want = solo.to_pandas().pca.map(lambda v: v[0]).to_numpy()
    assert np.allclose(np.sort(got), np.sort(want), atol=1e-9)


def test_patch_embed_weights_path_npz(ray_session, tmp_path):
    from pic2vec_ray.stages.embed import PatchEmbedActor

    rng = np.random.default_rng(7)
    W = rng.normal(0, 0.02, (4 * 4 * 3, 8)).astype(np.float32)
    p = str(tmp_path / "w.npz")
    np.savez(p, W=W)
    actor = PatchEmbedActor(patch=4, dim=8, weights_path=p, pos_encode=False)
    assert np.allclose(actor.W, W)
    with pytest.raises(ValueError):
        PatchEmbedActor(patch=4, dim=8, weights=W, weights_path=p)
    np.savez(str(tmp_path / "bad.npz"), other=W)
    with pytest.raises(ValueError):
        PatchEmbedActor(patch=4, dim=8, weights_path=str(tmp_path / "bad.npz"))


def test_dup_ngram_spans_exact_coordinates(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.dedup import dup_ngram_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [
            f"unique one two three {shared} tail words here now",   # pos 4..13
            f"{shared} completely different ending text",            # pos 0..9
            "no overlap with anything else at all in this document",
        ],
    })
    out = (dup_ngram_spans(rd.from_pandas(docs).repartition(3), n=8,
                           num_partitions=4)
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    # the 10 shared tokens yield 3 dup 8-gram starts -> one span each
    by_doc = {r.doc_id: (r.span_start, r.span_end, r.n_grams)
              for r in out.itertuples()}
    assert by_doc[1] == (4, 13, 3)
    assert by_doc[2] == (0, 9, 3)
    assert 3 not in by_doc


def test_char_entropy_known_values(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.text import char_entropy

    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["aaaa", "abab", "", "abcd"],
    })
    out = (rd.from_pandas(df).repartition(2)
           .map_batches(char_entropy, batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.char_entropy[0] == 0.0           # constant -> zero entropy
    assert out.char_entropy[1] == pytest.approx(np.log(2), abs=1e-6)
    assert out.char_entropy[2] == 0.0           # empty by convention
    assert out.char_entropy[3] == pytest.approx(np.log(4), abs=1e-6)
    assert out.n_chars_text.tolist() == [4, 4, 0, 4]
    assert not np.signbit(out.char_entropy).any()  # no -0.0 leaks


def test_bucket_batches_contiguous_per_group(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.pack import bucket_batches

    rng = np.random.default_rng(13)
    n = 300
    df = pd.DataFrame({
        "id": [f"k{i:04d}" for i in range(n)],
        "bucket": rng.choice(["64x64", "96x128"], n),
        "shard": rng.integers(0, 3, n),
    })
    out = (bucket_batches(rd.from_pandas(df).repartition(5),
                          by=["bucket", "shard"], order="id", batch_size=4,
                          num_partitions=4)
           .to_pandas())
    for (_, _), grp in out.groupby(["bucket", "shard"]):
        grp = grp.sort_values("id").reset_index(drop=True)
        expect = np.arange(len(grp)) // 4
        assert (grp.batch_no.to_numpy() == expect).all()


def test_weighted_sample_deterministic_and_biased(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.split import weighted_sample

    n = 2000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64)})
    # first half weight 1, second half weight 50
    df["w"] = np.where(df.id < n // 2, 1.0, 50.0)
    outs = []
    for nblocks in (2, 9):
        out = (weighted_sample(rd.from_pandas(df).repartition(nblocks),
                               id_col="id", weight_col="w", k=100)
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    heavy = (outs[0].id >= n // 2).sum()
    assert heavy > 85  # overwhelmingly from the weight-50 half
    with pytest.raises(Exception):
        weighted_sample(rd.from_pandas(pd.DataFrame({"id": [1], "w": [0.0]})),
                        id_col="id", weight_col="w", k=1).to_pandas()


def test_collapse_rare_threshold(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import collapse_rare

    df = pd.DataFrame({"k": ["a"] * 10 + ["b"] * 3 + ["c"] * 1,
                       "id": np.arange(14)})
    out = (collapse_rare(rd.from_pandas(df).repartition(3), key="k",
                         min_count=3)
           .to_pandas().sort_values("id").reset_index(drop=True))
    got = dict(zip(out.k, out.k_collapsed))
    assert got == {"a": "a", "b": "b", "c": "__other__"}


def test_bm25_matches_hand_formula(ray_session):
    import math

    import ray.data as rd
    from pic2vec_ray.stages.text import bm25_score

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["cat dog cat", "dog mouse", "bird bird bird bird"],
    })
    out = (bm25_score(rd.from_pandas(docs).repartition(2),
                      query_terms=["cat", "dog"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    N, avgdl = 3.0, (3 + 2 + 4) / 3.0
    k1, b = 1.2, 0.75

    def idf(dfc):
        return math.log(1.0 + (N - dfc + 0.5) / (dfc + 0.5))

    def w(tf, dl, dfc):
        return idf(dfc) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    assert out.bm25[0] == pytest.approx(w(2, 3, 1) + w(1, 3, 2), abs=1e-6)
    assert out.bm25[1] == pytest.approx(w(1, 2, 2), abs=1e-6)
    assert out.bm25[2] == 0.0
    assert out.dl.tolist() == [3, 2, 4]


def test_funnel_counts_first_touch_ordering(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.relational import funnel_counts

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # u1: full ordered funnel
        (1, t, "view"), (1, t + h, "click"), (1, t + 2 * h, "purchase"),
        # u2: click BEFORE view -> stops at view stage
        (2, t, "click"), (2, t + h, "view"),
        # u3: view+purchase but no click -> stops after view
        (3, t, "view"), (3, t + h, "purchase"),
        # u4: purchase before click (click after view, purchase too early)
        (4, t, "view"), (4, t + h, "purchase"), (4, t + 2 * h, "click"),
        # u5: never views
        (5, t, "click"), (5, t + h, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = funnel_counts(rd.from_pandas(df).repartition(4), id_col="user_id",
                        ts="ts", type_col="event_type",
                        stages=["view", "click", "purchase"],
                        num_partitions=3)
    got = dict(zip(out.stage, out.users))
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_pmi_topk_prefers_exclusive_pairs(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.text import pmi_topk

    # "x y" co-occur exclusively; "a b" frequent but promiscuous
    docs = (["x y"] * 8
            + ["a b"] * 20 + ["a c"] * 20 + ["d b"] * 20 + ["a e b"] * 10)
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    out = (pmi_topk(rd.from_pandas(df).repartition(4), window=2, k=5,
                    min_count=5, num_partitions=4)
           .to_pandas())
    top = out.iloc[0]
    assert (top.w1, top.w2) == ("x", "y")
    # manual PMI for (x, y) from the full pair table:
    # x->y 8; a->b 20+10(a e b window2)=30; a->c 20;
    # d->b 20; a->e 10; e->b 10
    Tn = 8 + 30 + 20 + 20 + 10 + 10
    import math
    want = math.log(8 * Tn / (8 * 8))
    assert top.pmi == pytest.approx(want, abs=1e-6)


def test_iqr_outliers_flags_planted(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.quantiles import iqr_outliers

    rng = np.random.default_rng(17)
    v = np.round(rng.uniform(10, 20, 500), 2)
    v[:3] = [1000.0, -500.0, 15.0]  # two extremes, one inlier
    df = pd.DataFrame({"event_id": np.arange(500, dtype=np.int64),
                       "g": ["a"] * 500, "value": v})
    out = (iqr_outliers(rd.from_pandas(df).repartition(4), keys="g",
                        value="value")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert bool(out.is_outlier[0]) and bool(out.is_outlier[1])
    assert not out.is_outlier[2]
    assert out.is_outlier.sum() == 2


def test_zorder_key_interleaves_bits(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.encode import zorder_key

    df = pd.DataFrame({"x": np.array([0, 1, 0, 3], dtype=np.int64),
                       "y": np.array([0, 0, 1, 5], dtype=np.int64)})
    out = (zorder_key(rd.from_pandas(df), x="x", y="y", bits=4)
           .to_pandas())
    # interleave: x bits even positions, y bits odd
    assert out.zkey.tolist() == [0, 1, 2, 0b100111]
    # locality: nearby (x, y) cells give nearby keys (same quadrant prefix)
    a = zorder_key(rd.from_pandas(pd.DataFrame(
        {"x": np.arange(8, dtype=np.int64).repeat(8),
         "y": np.tile(np.arange(8, dtype=np.int64), 8)})),
        x="x", y="y", bits=3).to_pandas()
    quad = (a.x // 4) * 2 + (a.y // 4)
    assert (a.groupby(quad).zkey.apply(lambda s: s.max() - s.min() < 16)).all()


def test_json_extract_field_types_and_nulls(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.relational import json_extract_field

    df = pd.DataFrame({
        "id": np.arange(4, dtype=np.int64),
        "props": ['{"k": 42, "s": "hi"}', '{"k": -7}', '{"other": 1}',
                  '{"s": "x y"}'],
    })
    ds = rd.from_pandas(df).repartition(2)
    ints = (json_extract_field(ds, col="props", field="k")
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert ints.props_k.tolist()[:2] == [42.0, -7.0]
    assert ints.props_k.isna().tolist() == [False, False, True, True]
    strs = (json_extract_field(ds, col="props", field="s", as_int=False)
            .to_pandas().sort_values("id").reset_index(drop=True))
    assert strs.props_s.tolist()[0] == "hi"
    assert strs.props_s.tolist()[3] == "x y"
    assert strs.props_s.isna().tolist() == [False, True, True, False]


def test_bm25_topk_ranks_relevant_docs(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.text import bm25_topk

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["cat dog", "cat cat cat", "dog", "bird", "cat dog bird",
                 "nothing relevant here"],
    })
    out = (bm25_topk(rd.from_pandas(docs).repartition(3),
                     queries=["cat", "dog bird"], k=3, num_partitions=2)
           .to_pandas().sort_values(["query_id", "score"],
                                    ascending=[True, False])
           .reset_index(drop=True))
    q0 = out[out.query_id == 0]
    assert set(q0.doc_id) <= {0, 1, 4}
    assert q0.iloc[0].doc_id == 1  # highest tf for "cat"
    q1 = out[out.query_id == 1]
    assert q1.iloc[0].doc_id == 4  # only doc with both terms
    assert 5 not in set(out.doc_id)  # non-matching doc never appears


def test_profile_columns_stats_and_limit(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.profile import profile_columns

    df = pd.DataFrame({
        "a": [1.0, 2.0, None, 4.0, 2.0],
        "b": [10, 10, 10, 20, 30],
    })
    out = profile_columns(rd.from_pandas(df).repartition(2),
                          columns=["a", "b"])
    pa_row = out[out.column == "a"].iloc[0]
    assert (pa_row.n_rows, pa_row.n_null, pa_row.min_val, pa_row.max_val,
            pa_row.n_distinct) == (5, 1, 1.0, 4.0, 3)
    pb = out[out.column == "b"].iloc[0]
    assert (pb.n_null, pb.n_distinct) == (0, 3)
    with pytest.raises(Exception):
        big = pd.DataFrame({"c": np.arange(1000, dtype=np.float64)})
        profile_columns(rd.from_pandas(big), columns=["c"],
                        distinct_limit=10)


def test_ecdf_transform_properties(ray_session):
    import ray.data as rd
    from pic2vec_ray.stages.quantiles import ecdf_transform

    rng = np.random.default_rng(41)
    v = rng.normal(50, 10, 4000)
    df = pd.DataFrame({"id": np.arange(4000, dtype=np.int64), "v": v})
    outs = []
    for nblocks in (1, 9):
        out = (ecdf_transform(rd.from_pandas(df).repartition(nblocks),
                              value="v", n_bins=512)
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-invariant
    got = outs[0]
    # monotone in v, ends at 1.0, tracks the true ECDF within bin error
    srt = got.sort_values("v")
    assert (np.diff(srt.v_ecdf.to_numpy()) >= 0).all()
    assert got.v_ecdf.max() == 1.0
    true_rank = pd.Series(v).rank(method="max").to_numpy() / len(v)
    assert np.abs(got.v_ecdf.to_numpy() - true_rank).max() < 0.05
