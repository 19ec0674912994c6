"""A5 observe-metrics and O2 split-calculation parity."""

from __future__ import annotations

from webindex_spark.operators import index_batch
from tests.test_index_batch import make_set1_pages


def test_observe_stats(spark):
    pages = make_set1_pages(spark)
    observed, obs = index_batch.observe_stats(pages)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # set1: 2 pages, 0 empty, 6 external links (IndexUtilTest fixture)
    assert m["num_pages"] == 2
    assert m["num_empty"] == 0
    assert m["num_external_links"] == 6


def test_calculate_splits(spark):
    pages = make_set1_pages(spark)
    _, _, index_rows = index_batch.build_index(pages, cache=False)
    splits = index_batch.calculate_splits(index_rows, 10)
    assert 0 < len(splits) <= 10
    assert splits == sorted(splits)
    # 29-byte truncation (IndexUtil.java:207-210)
    assert all(len(s.encode()) <= 29 for s in splits)
    # deterministic (seeded sample)
    assert splits == index_batch.calculate_splits(index_rows, 10)


def test_accumulo_default_splits_golden():
    """IndexEnvTest.java:26-31: 76 split points, first d:com.blogg,
    last t:fefeff:d; and they are usable range boundaries (sorted,
    unique, <= 29 bytes like calculate_splits output)."""
    from webindex_spark.operators.index_batch import accumulo_default_splits

    splits = accumulo_default_splits()
    assert len(splits) == 76
    assert splits[0] == "d:com.blogg"
    assert splits[-1] == "t:fefeff:d"
    assert splits == sorted(set(splits))
