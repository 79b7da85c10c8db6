"""Group-quota dedup budgets (stages/dedup.dedup_with_quota)."""

from __future__ import annotations

import pandas as pd
import pytest

from pic2vec_ray.stages.dedup import dedup_with_quota


def _corpus() -> pd.DataFrame:
    rows = []
    # source A: 8 distinct texts + 4 duplicates of text "a0"
    for i in range(8):
        rows.append((100 + i, f"a{i}", "A"))
    for i in range(4):
        rows.append((200 + i, "a0", "A"))
    # source B: 3 distinct texts
    for i in range(3):
        rows.append((300 + i, f"b{i}", "B"))
    # a cross-source duplicate: B's copy of "a1" loses to A's id 101
    rows.append((400, "a1", "B"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


def test_quota_cut_semantics(ray_session):
    import ray.data as rd

    out = (dedup_with_quota(rd.from_pandas(_corpus()), quota=5,
                            num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    by_src = out.groupby("source").doc_id.apply(list).to_dict()
    # source A: survivors 100..107 (dups of a0 lose to 100), quota 5
    # keeps the 5 smallest ids
    assert by_src["A"] == [100, 101, 102, 103, 104]
    # source B: b0-b2 survive; the a1 copy (id 400) loses the content
    # dedup to id 101, so B keeps exactly its 3 distinct texts
    assert by_src["B"] == [300, 301, 302]


def test_partition_invariance(ray_session):
    import ray.data as rd

    df = _corpus()
    outs = []
    for nparts, seed in ((2, 0), (7, 1)):
        shuffled = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
        ds = rd.from_pandas(shuffled).repartition(nparts)
        outs.append(dedup_with_quota(ds, quota=5, num_partitions=nparts)
                    .to_pandas().sort_values("doc_id")
                    .reset_index(drop=True)[["doc_id", "text", "source"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bad_quota_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="quota"):
        dedup_with_quota(rd.from_pandas(_corpus()), quota=0)
