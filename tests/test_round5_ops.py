"""Round-5 relational operators vs DuckDB on the sf0.001 testdata —
the same engine-vs-oracle comparison the driver's gate runs at sf0.01,
pinned here so a regression fails fast in CI rather than at the gate.

Covers the round-5 additions that run on the registered TPC-H-ish
views: range join, event gaps, cohort retention, skyline, quantile
sketch, hash/left joins, moving sum, set algebra, pivot, and the
above-group-average analytic.  The geo-side round-5 ops
(geo_cell_diameter, geo_bfs_hops) are exercised by the sf0.01 oracle
board (their SQL embeds the synthetic gazetteer path, pinned there).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ROUND5_QUERIES = [
    "rel_range_join",
    "rel_event_gaps",
    "rel_cohort_retention",
    "rel_skyline",
    "rel_quantile_sketch",
    "rel_hash_join",
    "rel_left_join",
    "rel_moving_sum",
    "rel_union_sources",
    "rel_pivot",
    "rel_above_group_avg",
    "rel_pair_support",
    "rel_dense_daily",
    "rel_region_rollup",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("name", ROUND5_QUERIES)
def test_round5_query_matches_oracle(ray_session, name):
    from georay import entrylib as e
    eng = _canon(getattr(e, f"q_{name}")(SF).to_pandas())
    ora = _canon(_oracle(e.build_oracle_sql()[name]))
    assert list(eng.columns) == list(ora.columns)
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
