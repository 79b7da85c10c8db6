"""Round-4 operators: approximate grouped quantiles (histogram sketch),
deterministic epoch shuffle, BPE tokenizer, hash_join broadcast plan,
GPU plumbing, overlapped checkpoint partitions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------ approx grouped quantiles


def _make_cont(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, 3, n),
        "v": rng.normal(100.0, 25.0, n),  # continuous: ~all-distinct
    })


def test_approx_quantiles_error_bound(ray_session):
    """|approx - exact| <= (mx - mn) / n_bins for every group/quantile."""
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = _make_cont()
    qs = (0.25, 0.5, 0.75, 0.9)
    B = 512
    got = (grouped_quantiles_approx(
        rd.from_pandas(df).repartition(8), keys="g", value="v",
        qs=qs, n_bins=B)
        .to_pandas().sort_values("g").reset_index(drop=True))
    width = (df.v.max() - df.v.min()) / B
    for g, grp in df.groupby("g"):
        row = got[got.g == g].iloc[0]
        assert row.n_rows == len(grp)
        vals = np.sort(grp.v.to_numpy())
        for q in qs:
            exact = vals[max(1, int(np.ceil(q * len(vals)))) - 1]
            # the true quantile lies in the reported bin
            assert abs(row[f"q{int(q * 100)}"] - exact) <= width + 1e-9


def test_approx_quantiles_partition_invariant(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = _make_cont(2000, seed=11)
    outs = []
    for nblocks in (1, 7):
        out = (grouped_quantiles_approx(
            rd.from_pandas(df).repartition(nblocks), keys="g", value="v",
            n_bins=256)
            .to_pandas().sort_values("g").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_approx_quantiles_constant_column(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import grouped_quantiles_approx

    df = pd.DataFrame({"g": [0] * 10, "v": [5.0] * 10})
    out = grouped_quantiles_approx(
        rd.from_pandas(df), keys="g", value="v", n_bins=64).to_pandas()
    assert out.q50.iloc[0] == 5.0 and out.n_rows.iloc[0] == 10


# ------------------------------------------------- epoch shuffle


def test_epoch_shuffle_is_permutation_and_partition_invariant(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import _epoch_hash, epoch_shuffle

    ids = np.arange(0, 1500, dtype=np.int64) * 7  # sparse ids
    df = pd.DataFrame({"doc_id": ids, "payload": ids * 2})
    outs = []
    for nblocks in (1, 5):
        out = (epoch_shuffle(rd.from_pandas(df).repartition(nblocks),
                             id_col="doc_id", epoch=2, seed=9,
                             num_buckets=256, num_partitions=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # positions form exactly 0..n-1
    assert sorted(got.position.tolist()) == list(range(len(df)))
    assert (got.epoch == 2).all()
    # position == rank of (hash, id): brute-force replay
    h = _epoch_hash(ids, 2, 9)
    order = np.lexsort((ids, h))
    expect = np.empty(len(ids), dtype=np.int64)
    expect[order] = np.arange(len(ids))
    assert (got.position.to_numpy() == expect).all()
    # payload rides along untouched
    assert (got.payload == got.doc_id * 2).all()


def test_epoch_shuffle_changes_between_epochs(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import epoch_shuffle

    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64)})
    a = (epoch_shuffle(rd.from_pandas(df), id_col="doc_id", epoch=0,
                       num_buckets=64, num_partitions=4)
         .to_pandas().sort_values("doc_id").position.to_numpy())
    b = (epoch_shuffle(rd.from_pandas(df), id_col="doc_id", epoch=1,
                       num_buckets=64, num_partitions=4)
         .to_pandas().sort_values("doc_id").position.to_numpy())
    assert (a != b).mean() > 0.99


def test_epoch_shuffle_rejects_negative_ids(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import epoch_shuffle

    df = pd.DataFrame({"doc_id": [-1, 2, 3]})
    with pytest.raises(Exception):
        epoch_shuffle(rd.from_pandas(df), id_col="doc_id",
                      epoch=0).to_pandas()


# ------------------------------------------ hash_join broadcast plan


def _join_frames(seed=3):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 800),
        "lv": rng.integers(0, 1000, 800),
    })
    # include null keys on both sides + keys with no match
    left.loc[::97, "k"] = np.nan
    right = pd.DataFrame({
        "k": rng.integers(25, 75, 120),
        "rv": rng.integers(0, 9, 120),
        "lv": rng.integers(0, 9, 120),  # clash -> suffixed
    })
    right.loc[::41, "k"] = np.nan
    return left, right


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_broadcast_equals_shuffle(ray_session, how):
    import ray.data as rd

    from pic2vec_ray.temporal.join import hash_join

    left, right = _join_frames()
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).materialize()

    def canon(ds):
        df = ds.to_pandas()
        return (df.astype({c: "float64" for c in df.columns})
                .sort_values(list(df.columns), na_position="last")
                .reset_index(drop=True))

    got_b = canon(hash_join(lds, rds, on="k", how=how, broadcast=True))
    got_s = canon(hash_join(lds, rds, on="k", how=how, broadcast=False,
                            num_partitions=8))
    pd.testing.assert_frame_equal(got_b, got_s)


def test_hash_join_auto_picks_broadcast_for_materialized_small(ray_session):
    import ray.data as rd

    from pic2vec_ray.temporal import join as join_mod

    left, right = _join_frames(9)
    lds = rd.from_pandas(left)
    called = {}
    orig = join_mod._hash_join_broadcast

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    join_mod._hash_join_broadcast, bak = spy, orig
    try:
        # materialized + tiny -> broadcast
        join_mod.hash_join(lds, rd.from_pandas(right).materialize(),
                           on="k", how="inner").to_pandas()
        assert called.pop("yes", False)
        # lazy right side -> shuffle (metadata-only test must not
        # trigger execution)
        join_mod.hash_join(lds, rd.from_pandas(right).repartition(2),
                           on="k", how="inner").to_pandas()
        assert not called
        # right/outer never broadcast
        with pytest.raises(ValueError):
            join_mod.hash_join(lds, rd.from_pandas(right).materialize(),
                               on="k", how="outer", broadcast=True)
    finally:
        join_mod._hash_join_broadcast = bak


# ------------------------------------------------ GPU plumbing


def test_featurize_num_gpus_reaches_map_batches(ray_session, images_dir):
    """The kwarg is threaded to map_batches when the cluster has GPUs
    (asserted via a fake dataset), and silently dropped with a warning
    on a GPU-less cluster so the pool cannot deadlock."""
    import warnings

    from pic2vec_ray.pipelines import featurize as fz

    class FakeDS:
        def __init__(self):
            self.calls = []

        def map_batches(self, *a, **kw):
            self.calls.append(kw)
            return self

    # GPU-less cluster (this sandbox): kwarg dropped + warned
    fake = FakeDS()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fz.featurize_images(fake, model_str="tinynet", num_gpus=0.5,
                            concurrency=2)
    assert "num_gpus" not in fake.calls[-1]
    assert any("falling back to CPU-only" in str(x.message) for x in w)

    # pretend the cluster has GPUs: kwarg must reach map_batches
    import ray

    real = ray.cluster_resources
    try:
        ray.cluster_resources = lambda: {**real(), "GPU": 4.0}
        fake = FakeDS()
        fz.featurize_images(fake, model_str="tinynet", num_gpus=0.25,
                            num_cpus=0.5, concurrency=2)
        assert fake.calls[-1]["num_gpus"] == 0.25
        assert fake.calls[-1]["num_cpus"] == 0.5
    finally:
        ray.cluster_resources = real


def test_featurize_runs_with_gpu_fallback(ray_session, images_dir):
    """End-to-end: num_gpus on a CPU sandbox still produces features."""
    import warnings

    from pic2vec_ray.pipelines.featurize import featurize_images

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ds = featurize_images(images_dir, model_str="tinynet", depth=1,
                              batch_size=64, concurrency=2, num_gpus=1)
    df = ds.to_pandas()
    assert len(df) == 200 and len(df.features.iloc[0]) == 128


# --------------------------------------- overlapped checkpoint runs


def test_run_partitioned_overlap_matches_serial(ray_session, images_dir):
    import shutil

    import pyarrow.parquet as pq

    from pic2vec_ray.pipelines.featurize import featurize_images
    from pic2vec_ray.state.checkpoint import run_partitioned

    def pipeline(ds):
        return featurize_images(ds, model_str="tinynet", depth=1,
                                concurrency=1, batch_size=64)

    # the sf0.001 images table is a single parquet file; respread it so
    # the run really has 4 partitions to overlap
    import ray.data as rd

    inp = "/tmp/pic2vec_ray_test_ckpt_input"
    shutil.rmtree(inp, ignore_errors=True)
    rd.read_parquet(images_dir).repartition(4).write_parquet(inp)
    images_dir = inp

    # overlap 2 on the 4-CPU test session: 2 pools x 1 actor leaves
    # CPUs for the read/write tasks (4 pools would starve them — the
    # exact oversubscription hazard the docstring warns about)
    outs = {}
    for label, kcc in (("serial", 1), ("overlap", 2)):
        out = f"/tmp/pic2vec_ray_test_ckpt_{label}"
        shutil.rmtree(out, ignore_errors=True)
        s = run_partitioned(images_dir, out, pipeline, num_partitions=4,
                            max_concurrent=kcc)
        nparts = s["num_partitions"]
        assert sorted(s["ran"]) == list(range(nparts)) and s["skipped"] == []
        frames = [pq.read_table(f"{out}/part={k}").to_pandas()
                  for k in range(nparts)]
        df = (pd.concat(frames).sort_values("image_id")
              .reset_index(drop=True))
        outs[label] = df
        # resume sees everything done
        s2 = run_partitioned(images_dir, out, pipeline, num_partitions=4,
                             max_concurrent=kcc)
        assert s2["ran"] == [] and len(s2["skipped"]) == nparts
    a, b = outs["serial"], outs["overlap"]
    assert a.image_id.tolist() == b.image_id.tolist()
    assert (a.missing == b.missing).all()
    fa = np.stack(a.features.to_numpy())
    fb = np.stack(b.features.to_numpy())
    assert np.array_equal(fa, fb)


# -------------------------------------------------- BPE tokenizer


def test_bpe_merge_pass_semantics():
    from pic2vec_ray.stages.tokenizer import _merge_word

    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(list("xaby"), "a", "b") == ["x", "ab", "y"]
    assert _merge_word(["ab", "b"], "a", "b") == ["ab", "b"]


def test_bpe_string_replace_equals_list_merge():
    """The delimited-string replacement (what SQL REPLACE runs) is
    exactly the list-form greedy pass, on adversarial inputs."""
    import itertools

    from pic2vec_ray.stages.tokenizer import (
        SEP, _delim, _merge_pattern, _merge_word)

    rng = np.random.default_rng(5)
    words = ["".join(rng.choice(list("ab"), size=n))
             for n in rng.integers(1, 9, 200)]
    for word in words:
        for a, b in itertools.product("ab", repeat=2):
            pat, rep = _merge_pattern(a, b)
            via_str = _delim(word).replace(pat, rep)
            got = [t for t in via_str.split(SEP) if t]
            assert got == _merge_word(list(word), a, b), (word, a, b)


def test_bpe_tokenize_matches_reference_loop(ray_session):
    """Distributed vectorized apply == a plain per-word reference loop
    applying the same merges."""
    import ray.data as rd

    from pic2vec_ray.stages.tokenizer import (
        PINNED_MERGES, _merge_word, bpe_tokenize)

    texts = ["The quick brown fox!", "low lower lowest 123",
             "", "aaaa bbbb abab", "Entity-44 shipped 9 units?"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (bpe_tokenize(rd.from_pandas(df), PINNED_MERGES,
                        output="tokens", concurrency=1)
           .to_pandas().sort_values("doc_id"))

    import re

    def ref(text):
        toks = []
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            syms = list(w)
            for a, b in PINNED_MERGES:
                syms = _merge_word(syms, a, b)
            toks.extend(syms)
        return toks

    for _, row in got.iterrows():
        assert list(row.tokens) == ref(texts[row.doc_id]), texts[row.doc_id]
    # detokenize roundtrip: concatenation restores the letter stream
    for _, row in got.iterrows():
        import re as _re

        assert "".join(row.tokens) == "".join(
            _re.findall(r"[a-z0-9]+", texts[row.doc_id].lower()))


def test_pinned_merges_match_fit(ray_session):
    """Drift guard: PINNED_MERGES is exactly fit_bpe(sf0.001 docs)."""
    import ray.data as rd

    from pic2vec_ray.stages.tokenizer import PINNED_MERGES, fit_bpe

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    assert fit_bpe(ds, num_merges=120) == PINNED_MERGES


def test_bpe_count_handles_empty_and_missing_words(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.tokenizer import PINNED_MERGES, bpe_tokenize

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "?!--", "one two"]})
    got = (bpe_tokenize(rd.from_pandas(df), PINNED_MERGES,
                        output="count", concurrency=1)
           .to_pandas().sort_values("doc_id"))
    assert got.n_tokens_bpe.iloc[0] == 0 and got.n_tokens_bpe.iloc[1] == 0
    assert got.n_tokens_bpe.iloc[2] >= 2


# -------------------------------------------- drop-count surfacing


def test_filters_report_drop_counts(ray_session):
    import ray
    import ray.data as rd

    from pic2vec_ray.stages.decontam import decontaminate, word_ngrams_batch
    from pic2vec_ray.stages.text import quality_filter
    from pic2vec_ray.state.metrics import DropCounter

    counter = DropCounter.remote()
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["the quick brown fox jumps over the lazy dog today"] * 2
                + ["completely different words appear in this sentence here now ok"] * 4,
    })
    grams, _ = word_ngrams_batch(docs.text.iloc[:1], 8)
    clean = decontaminate(rd.from_pandas(docs), frozenset(grams.tolist()),
                          n=8, drop_counter=counter)
    kept = clean.to_pandas()
    assert len(kept) == 4
    # short/punct-free junk rows get filtered with the count surfaced
    junk = pd.DataFrame({"doc_id": range(5), "text": ["!!!", "x", "ok?!", "", "....."]})
    out = quality_filter(rd.from_pandas(junk), cutoff=0.5,
                         drop_counter=counter).to_pandas()
    counts = ray.get(counter.get.remote())
    assert counts["decontaminate"] == 2
    assert counts["quality_filter"] == 5 - len(out)
    assert counts["quality_filter"] > 0


# ------------------------------------- round-4 widening: woe / winsor /
# ------------------------------------- grouped corr / per-group top-k


def test_woe_encode_matches_formula(ray_session):
    import math

    import ray.data as rd

    from pic2vec_ray.stages.encode import woe_encode

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.choice(list("abc"), 400),
        "y": rng.integers(0, 2, 400),
    })
    out = (woe_encode(rd.from_pandas(df).repartition(5), key="k", target="y")
           .to_pandas())
    s = 0.5
    pos_tot = float(df.y.sum())
    neg_tot = float(len(df) - df.y.sum())
    for k, grp in df.groupby("k"):
        p, n = float(grp.y.sum()), float(len(grp))
        want = round(math.log(((p + s) / (pos_tot + 2 * s))
                              / ((n - p + s) / (neg_tot + 2 * s))), 6)
        got = out.loc[out.k == k, "k_woe"].unique()
        assert len(got) == 1 and got[0] == want


def test_woe_encode_empty_category_finite(ray_session):
    """A category with zero positives still gets a finite WOE."""
    import ray.data as rd

    from pic2vec_ray.stages.encode import woe_encode

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 5,
                       "y": [1, 1, 0, 1, 0] + [0] * 5})
    out = woe_encode(rd.from_pandas(df), key="k", target="y").to_pandas()
    assert np.isfinite(out["k_woe"]).all()
    assert out.loc[out.k == "b", "k_woe"].max() < out.loc[out.k == "a", "k_woe"].min()


def test_winsorize_clip_edges_near_exact(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import winsorize

    rng = np.random.default_rng(5)
    v = rng.normal(0.0, 10.0, 4000)
    df = pd.DataFrame({"i": np.arange(len(v)), "v": v})
    B = 1024
    out = (winsorize(rd.from_pandas(df).repartition(6), value="v",
                     lo_q=0.05, hi_q=0.95, n_bins=B)
           .to_pandas().sort_values("i").reset_index(drop=True))
    width = (v.max() - v.min()) / B
    lo_exact = np.sort(v)[int(np.ceil(0.05 * len(v))) - 1]
    hi_exact = np.sort(v)[int(np.ceil(0.95 * len(v))) - 1]
    lo, hi = out.v_w.min(), out.v_w.max()
    assert abs(lo - lo_exact) <= width + 1e-9
    assert abs(hi - hi_exact) <= width + 1e-9
    # interior rows pass through untouched; tails are clipped to the edges
    inner = (df.v > lo) & (df.v < hi)
    assert np.array_equal(out.v_w[inner.to_numpy()],
                          df.v[inner].to_numpy())
    assert (out.v_w >= lo).all() and (out.v_w <= hi).all()


def test_winsorize_constant_column(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import winsorize

    df = pd.DataFrame({"i": range(10), "v": [7.0] * 10})
    out = winsorize(rd.from_pandas(df), value="v").to_pandas()
    assert (out.v_w == 7.0).all()


def test_grouped_corr_matches_pandas(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.relational import grouped_corr

    rng = np.random.default_rng(9)
    n = 3000
    g = rng.choice(list("pq"), n)
    x = rng.normal(0, 1, n)
    y = 0.6 * x + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    out = (grouped_corr(rd.from_pandas(df).repartition(7),
                        keys="g", x="x", y="y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in out.iterrows():
        grp = df[df.g == row.g]
        assert row.n_rows == len(grp)
        assert abs(row.corr_xy - grp.x.corr(grp.y)) < 1e-6


def test_token_topk_by_group_exact_and_tiebreak(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.text import token_topk_by_group

    df = pd.DataFrame({
        "lang": ["en"] * 3 + ["fr"] * 2,
        "text": ["aa bb aa cc", "bb aa dd", "zz aa",
                 "le le la", "la le un"],
    })
    out = (token_topk_by_group(rd.from_pandas(df).repartition(3),
                               group_col="lang", k=2)
           .to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True))
    # en: aa=4, bb=2 > cc=1=dd=1=zz=1; fr: le=4? le appears 3x la 2x un 1x
    en = out[out.lang == "en"]
    assert list(en.token) == ["aa", "bb"] and list(en.cnt) == [4, 2]
    fr = out[out.lang == "fr"]
    assert list(fr.token) == ["le", "la"] and list(fr.cnt) == [3, 2]
    assert list(out.rnk) == [1, 2, 1, 2]


def test_onehot_declared_and_unknown(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.encode import onehot_encode

    df = pd.DataFrame({"i": range(4), "k": ["a-b", "c d", "a-b", "zz"]})
    out = (onehot_encode(rd.from_pandas(df), key="k",
                         categories=["a-b", "c d"])
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert list(out.k_a_b) == [1, 0, 1, 0]
    assert list(out.k_c_d) == [0, 1, 0, 0]
    # undeclared category -> all zeros, schema unchanged
    assert out.loc[3, ["k_a_b", "k_c_d"]].sum() == 0


def test_hash_encode_deterministic_and_bounded(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.encode import _horner64, hash_encode

    df = pd.DataFrame({"i": range(100),
                       "k": [f"cat{i % 17}" for i in range(100)]})
    outs = []
    for nb in (1, 9):
        out = (hash_encode(rd.from_pandas(df).repartition(nb),
                           key="k", n_buckets=8)
               .to_pandas().sort_values("i").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert outs[0].k_bucket.between(0, 7).all()
    assert (outs[0].k_bucket ==
            outs[0].k.map(lambda s: _horner64(s) % 8)).all()


def test_ntile_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from pic2vec_ray.temporal.windows import ntile

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "id": np.arange(500),
        "g": rng.choice(list("xyz"), 500),
        "v": rng.normal(0, 1, 500).round(3),  # rounded -> real ties
    })
    for n in (1, 3, 4, 7, 600):  # 600 > group size: one row per tile
        got = (ntile(rd.from_pandas(df).repartition(4), by="g", order="v",
                     tiebreak="id", n=n)
               .to_pandas().sort_values("id").reset_index(drop=True))
        exp = duckdb.sql(
            f"SELECT id, NTILE({n}) OVER (PARTITION BY g ORDER BY v, id)"
            " AS tile FROM df ORDER BY id").df()
        assert np.array_equal(got.tile.to_numpy(), exp.tile.to_numpy()), n


def test_ks_drift_sanity(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import ks_drift

    rng = np.random.default_rng(21)
    same = pd.DataFrame({
        "side": ["a"] * 2000 + ["b"] * 2000,
        "v": np.concatenate([rng.normal(0, 1, 2000),
                             rng.normal(0, 1, 2000)]),
    })
    out = ks_drift(rd.from_pandas(same).repartition(5), group_col="side",
                   value="v", a="a", b="b").to_pandas()
    assert out.ks_stat[0] < 0.1 and out.n_a[0] == 2000 and out.n_b[0] == 2000
    # disjoint supports -> KS = 1
    far = pd.DataFrame({
        "side": ["a"] * 100 + ["b"] * 100,
        "v": np.concatenate([rng.normal(0, 1, 100),
                             rng.normal(100, 1, 100)]),
    })
    out2 = ks_drift(rd.from_pandas(far), group_col="side",
                    value="v", a="a", b="b").to_pandas()
    assert out2.ks_stat[0] == 1.0
    # vs exact two-sample KS within histogram resolution
    va = same[same.side == "a"].v.to_numpy()
    vb = same[same.side == "b"].v.to_numpy()
    allv = np.sort(np.concatenate([va, vb]))
    exact = np.max(np.abs(
        np.searchsorted(np.sort(va), allv, side="right") / len(va)
        - np.searchsorted(np.sort(vb), allv, side="right") / len(vb)))
    assert abs(out.ks_stat[0] - exact) < 0.02


def test_bigram_lm_score_matches_bruteforce(ray_session):
    import math

    import ray.data as rd

    from pic2vec_ray.stages.text import bigram_lm_score

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b c", "b c b c", "a a a", "x"],  # doc 3: no bigram
    })
    out = (bigram_lm_score(rd.from_pandas(docs).repartition(3), alpha=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # brute force
    from collections import Counter
    bigs = {}
    cb = Counter()
    for _, r in docs.iterrows():
        ws = r.text.split()
        bigs[r.doc_id] = list(zip(ws, ws[1:]))
        cb.update(bigs[r.doc_id])
    cu = Counter()
    for (w1, _), c in cb.items():
        cu[w1] += c
    V = len(cu)
    assert list(out.doc_id) == [0, 1, 2]  # doc 3 absent (no bigrams)
    for _, row in out.iterrows():
        pairs = bigs[row.doc_id]
        want = sum(-math.log((cb[p] + 0.5) / (cu[p[0]] + 0.5 * V))
                   for p in pairs) / len(pairs)
        assert row.n_bigrams == len(pairs)
        assert abs(row.lm_score - want) < 1e-6
    # gibberish scores worse than typical text
    docs2 = pd.DataFrame({
        "doc_id": range(20),
        "text": ["the cat sat on the mat"] * 19 + ["zq xv qqq zk pw mm"],
    })
    o2 = (bigram_lm_score(rd.from_pandas(docs2)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert o2.lm_score.iloc[19] > o2.lm_score.iloc[:19].max()


def test_cooccur_topk_bruteforce_and_boundaries(ray_session):
    import ray.data as rd
    from collections import Counter

    from pic2vec_ray.stages.text import cooccur_topk

    rng = np.random.default_rng(17)
    vocab = list("abcdef")
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
             for _ in range(60)]
    docs = pd.DataFrame({"doc_id": range(60), "text": texts})
    W, K = 3, 10
    got = (cooccur_topk(rd.from_pandas(docs).repartition(4),
                        window=W, k=K).to_pandas())
    cnt = Counter()
    for t in texts:
        ws = t.split()
        for i, w1 in enumerate(ws):
            for j in range(i + 1, min(i + W, len(ws) - 1) + 1):
                cnt[(w1, ws[j])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert [((r.w1, r.w2), r.cnt) for r in got.itertuples()] == want


def test_cms_overestimates_only_and_tracks_truth(ray_session):
    import ray.data as rd
    from collections import Counter

    from pic2vec_ray.stages.sketch import cms_token_counts

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(200)]
    weights = np.arange(200, 0, -1, dtype=np.float64)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, 50, p=weights)) for _ in range(80)]
    truth = Counter(t for s in texts for t in s.split())
    probes = ["w0", "w1", "w50", "w199", "absent"]
    out = (cms_token_counts(rd.from_pandas(pd.DataFrame({"text": texts}))
                            .repartition(5),
                            probes=probes, depth=4, width=2048)
           .to_pandas().set_index("token"))
    total = sum(truth.values())
    for p in probes:
        est, true = out.loc[p, "est_cnt"], truth.get(p, 0)
        assert est >= true  # CMS never undercounts
        assert est - true <= 2 * total / 2048 + 1  # CM error bound-ish
    assert list(out.index) == sorted(probes)


def test_robust_scale_outlier_insensitive(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import robust_scale

    rng = np.random.default_rng(41)
    v = rng.normal(50.0, 5.0, 3000)
    v[:10] = 500.0  # outliers an order of magnitude out; the one-pass
    # histogram needs the span to stay resolvable (a 1e6 outlier with
    # 4096 bins puts the whole bulk in one bin - documented limitation)
    df = pd.DataFrame({"i": np.arange(len(v)), "v": v})
    out = (robust_scale(rd.from_pandas(df).repartition(6), value="v",
                        n_bins=4096)
           .to_pandas().sort_values("i").reset_index(drop=True))
    med = np.median(v)
    iqr = np.quantile(v, 0.75) - np.quantile(v, 0.25)
    inner = out.v_rs[10:]
    want = (v[10:] - med) / iqr
    # histogram resolution on a 1e6 span is coarse; direction + scale
    # must match and the bulk stays within a few units
    assert np.corrcoef(inner, want)[0, 1] > 0.99
    assert np.abs(np.median(out.v_rs)) < 0.5
    assert np.abs(np.abs(inner - want).median()) < 0.5


def test_temperature_mixture_rates(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.split import temperature_mixture

    df = pd.DataFrame({
        "doc_id": np.arange(13000, dtype=np.int64),
        "src": ["big"] * 10000 + ["mid"] * 2500 + ["small"] * 500,
    })
    out = (temperature_mixture(rd.from_pandas(df).repartition(5),
                               id_col="doc_id", key_col="src", alpha=0.5)
           .to_pandas())
    kept = out.src.value_counts()
    # alpha=0.5: rate_s = sqrt(n_small/n_s); small kept ~whole
    assert kept["small"] == 500
    for s, n in (("big", 10000), ("mid", 2500)):
        want = n * (500 / n) ** 0.5
        assert abs(kept[s] - want) / want < 0.15
    # alpha=1 keeps everything
    out1 = temperature_mixture(rd.from_pandas(df), id_col="doc_id",
                               key_col="src", alpha=1.0).to_pandas()
    assert len(out1) == len(df)
    with pytest.raises(ValueError):
        temperature_mixture(rd.from_pandas(df), id_col="doc_id",
                            key_col="src", alpha=0.0)


def test_contamination_report_pairs(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.decontam import (contamination_report,
                                             eval_ngram_owners)

    shared = "one two three four five six seven eight"
    evald = pd.DataFrame({
        "doc_id": [100, 101],
        "text": [shared + " tail a", "nine ten" + " filler" * 8],
    })
    train = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [shared + " extra",            # shares 1 gram w/ doc 100
                 shared + " tail b",           # shares 2 grams w/ doc 100
                 "clean words only here " * 3],
    })
    owners = eval_ngram_owners(rd.from_pandas(evald), n=8)
    out = (contamination_report(rd.from_pandas(train).repartition(2),
                                owners, n=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.doc_id) == [1, 2]
    assert list(out.eval_doc) == [100, 100]
    assert list(out.shared_grams) == [1, 2]


def test_augment_primitives_and_fn_roundtrip(ray_session, images_dir):
    import ray.data as rd

    from pic2vec_ray.codecs.png import decode_png, encode_png
    from pic2vec_ray.stages.augment import (AUGMENTS, center_crop, hflip,
                                            make_augment_fn, rotate90, vflip)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    assert np.array_equal(hflip(img), img[:, ::-1])
    assert np.array_equal(vflip(img), img[::-1])
    assert np.array_equal(rotate90(img), np.rot90(img))
    assert center_crop(img, 8, 8).shape == (8, 8, 3)
    assert center_crop(img, 100, 100).shape == img.shape  # clamped

    rows = pd.DataFrame({
        "image_id": [f"im{i}" for i in range(6)],
        "fmt": ["png"] * 6,
        "bytes": [encode_png(rng.integers(0, 256, (16, 16, 3),
                                          dtype=np.uint8))
                  for _ in range(6)],
    })
    outs = []
    for nb in (1, 3):
        out = (rd.from_pandas(rows).repartition(nb)
               .map_batches(make_augment_fn(), batch_format="pyarrow")
               .to_pandas().sort_values("image_id").reset_index(drop=True))
        outs.append(out)
    # deterministic under partitioning (op choice hashes the id)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # decoded augmented bytes == augment(decoded original)
    for _, r in outs[0].iterrows():
        src = decode_png(rows.set_index("image_id").loc[r.image_id, "bytes"])
        want = AUGMENTS[r.aug](src)
        assert np.array_equal(decode_png(bytes(r["bytes"])), want)
    with pytest.raises(ValueError):
        make_augment_fn(ops=["nope"])


def test_patch_embed_matches_manual_matmul(ray_session):
    import ray.data as rd

    from pic2vec_ray.codecs.png import encode_png
    from pic2vec_ray.stages.decode import make_patchify_fn
    from pic2vec_ray.stages.embed import PatchEmbedActor

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)  # 2x3 grid
    ds = rd.from_pandas(pd.DataFrame({
        "image_id": ["a"], "bytes": [encode_png(img)]}))
    tiles = ds.map_batches(make_patchify_fn(patch=16),
                           batch_format="pyarrow")
    out = tiles.map_batches(
        PatchEmbedActor, fn_constructor_kwargs={
            "patch": 16, "dim": 32, "pos_encode": False},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert len(out) == 6
    actor = PatchEmbedActor(patch=16, dim=32, pos_encode=False)
    t00 = img[:16, :16].reshape(-1).astype(np.float32)
    want = ((t00 / 255.0) - 0.5) @ actor.W
    got = np.asarray(out.sort_values("patch_no").iloc[0].embedding,
                     dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # positional encoding separates identical tiles
    flat = pd.DataFrame({
        "image_id": ["b"],
        "bytes": [encode_png(np.full((32, 32, 3), 128, np.uint8))]})
    out2 = (rd.from_pandas(flat)
            .map_batches(make_patchify_fn(patch=16), batch_format="pyarrow")
            .map_batches(PatchEmbedActor,
                         fn_constructor_kwargs={"patch": 16, "dim": 32},
                         batch_format="pyarrow", concurrency=1)
            .to_pandas())
    vecs = np.stack(out2.embedding.to_numpy())
    assert not np.allclose(vecs[0], vecs[1])
    with pytest.raises(ValueError):
        PatchEmbedActor(patch=16, dim=8,
                        weights=np.zeros((3, 3), np.float32))


def test_pca_project_properties(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.similarity import pca_project

    rng = np.random.default_rng(5)
    # anisotropic cloud: variance concentrated on two known axes
    basis = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    scales = np.array([10.0, 5.0, 1, 1, 1, 1, 1, 1])
    X = rng.normal(size=(2000, 8)) * scales @ basis.T
    df = pd.DataFrame({"vec_id": np.arange(2000),
                       "embedding": list(X.astype(np.float32))})
    outs = []
    for nb in (1, 6):
        out_ds, (comps, evar, mean) = pca_project(
            rd.from_pandas(df).repartition(nb), dim_out=2)
        out = out_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append((out, comps, evar))
    # partition invariance of the fit and the projection
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-9)
    p0 = np.stack(outs[0][0].pca.to_numpy())
    p1 = np.stack(outs[1][0].pca.to_numpy())
    np.testing.assert_allclose(p0, p1, atol=1e-9)
    # explained variance ordering + magnitude
    evar = outs[0][2]
    assert evar[0] > evar[1] > 0
    assert abs(np.sqrt(evar[0]) - 10.0) < 1.0
    # projection variance equals the eigenvalues
    np.testing.assert_allclose(p0.var(axis=0), evar, rtol=0.05)
    # components orthonormal
    comps = outs[0][1]
    np.testing.assert_allclose(comps.T @ comps, np.eye(2), atol=1e-9)


def test_substring_dup_detects_offset_copies(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.dedup import substring_dup_pairs

    rng = np.random.default_rng(11)

    def junk(n):
        return "".join(rng.choice(list("abcdefghij "), n))

    span = ("the quick brown fox jumps over the lazy dog while the "
            "band plays on and the crowd cheers loudly forever " * 3)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [junk(200) + span + junk(100),     # copy at offset ~200
                 junk(37) + span + junk(250),      # copy at offset ~37
                 junk(600),                        # unrelated
                 junk(550)],                       # unrelated
    })
    outs = []
    for nb in (1, 3):
        out = (substring_dup_pairs(rd.from_pandas(docs).repartition(nb),
                                   k=8, sel_mod=16, window=64,
                                   num_partitions=8)
               .to_pandas().sort_values(["id_a", "id_b"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0]
    # the offset copies share fingerprints; the junk docs pair with no one
    assert (0, 1) in set(zip(got.id_a, got.id_b))
    row = got[(got.id_a == 0) & (got.id_b == 1)].iloc[0]
    assert row.shared_spans >= 2
    assert not ((got.id_a.isin([2, 3])) | (got.id_b.isin([2, 3]))).any()


def test_winnow_anchors_content_defined(ray_session):
    """Identical spans yield identical fingerprints regardless of the
    prefix length before them."""
    from pic2vec_ray.stages.dedup import winnow_fingerprints_batch

    span = "x" * 10 + "some very specific shared content here" * 4
    texts = ["AAA" + span, "BBBBBBBBBBBBB" + span]
    d, p, fp = winnow_fingerprints_batch(texts, k=8, sel_mod=8, window=32)
    f0 = set(fp[d == 0])
    f1 = set(fp[d == 1])
    assert f0 and f0 & f1  # shared anchors survive the offset shift


def test_image_neardup_pairs_planted(ray_session):
    import ray.data as rd

    from pic2vec_ray.codecs.png import encode_png
    from pic2vec_ray.functions.image_ops import average_hash
    from pic2vec_ray.stages.dedup import image_neardup_pairs

    rng = np.random.default_rng(23)
    # strongly-blocked images: average hash stable under small noise
    def blocky(seed):
        r = np.random.default_rng(seed)
        blocks = r.integers(0, 2, (8, 8)) * 255
        return np.repeat(np.repeat(blocks, 8, 0), 8, 1)[..., None] \
            .repeat(3, 2).astype(np.uint8)

    base = blocky(1)
    noisy = base.copy()
    noisy[:2, :2] ^= 4  # tiny perturbation
    h0, h1 = average_hash(base), average_hash(noisy)
    planted_ham = bin(h0 ^ h1).count("1")
    assert planted_ham <= 3  # the pair is genuinely near-dup
    rows = pd.DataFrame({
        "image_id": ["a", "b", "c", "d"],
        "bytes": [encode_png(base), encode_png(noisy),
                  encode_png(blocky(2)), encode_png(blocky(3))],
    })
    out = (image_neardup_pairs(rd.from_pandas(rows).repartition(2),
                               max_hamming=3, num_partitions=4)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert ("a", "b") in set(zip(out.id_a, out.id_b))
    got = out[(out.id_a == "a") & (out.id_b == "b")].iloc[0]
    assert got.hamming == planted_ham
    # unrelated blocky images stay unpaired unless hashes truly collide
    others = out[~((out.id_a == "a") & (out.id_b == "b"))]
    for _, r in others.iterrows():
        assert r.hamming <= 3  # any extra pair is a true near-collision
    with pytest.raises(ValueError):
        image_neardup_pairs(rd.from_pandas(rows), max_hamming=9)


def test_ks_drift_windows_detects_shift_day(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.quantiles import ks_drift_windows

    rng = np.random.default_rng(29)
    days, vals = [], []
    for d in range(4):
        n = 800
        days.extend([pd.Timestamp("2026-01-01") + pd.Timedelta(days=d)] * n)
        # day 2 shifts the distribution hard; others are iid
        vals.extend(rng.normal(50.0 if d != 2 else 80.0, 5.0, n))
    df = pd.DataFrame({"ts": pd.to_datetime(days), "value": vals})
    out = (ks_drift_windows(rd.from_pandas(df).repartition(5),
                            ts_col="ts", value="value", freq="D")
           .to_pandas().sort_values("win").reset_index(drop=True))
    assert len(out) == 3  # consecutive pairs
    assert (out.n_prev == 800).all() and (out.n_cur == 800).all()
    stats = out.ks_stat.to_numpy()
    # 1->2 and 2->3 transitions show the shift; 0->1 does not
    assert stats[1] > 0.9 and stats[2] > 0.9
    assert stats[0] < 0.1


def test_snapshot_diff_classifies(ray_session):
    import ray.data as rd

    from pic2vec_ray.stages.dedup import snapshot_diff

    old = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta", "gamma delta", "epsilon", "zeta eta"],
    })
    new = pd.DataFrame({
        "doc_id": [2, 3, 4, 5],
        "text": ["gamma delta", "epsilon CHANGED", "zeta  eta ", "theta"],
    })  # 4: whitespace-only edit -> normalized fingerprint UNCHANGED
    out = (snapshot_diff(rd.from_pandas(old).repartition(2),
                         rd.from_pandas(new).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out.doc_id, out.status))
    assert got == {1: "removed", 3: "changed", 5: "added"}
