"""Driver smoke contract: entry() runs and yields rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "item_x",
        "item_y",
        "corr",
        "cos",
        "reg_corr",
        "jaccard",
        "n",
        "rank",
    ]


def test_queries_oracles_consistent():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
