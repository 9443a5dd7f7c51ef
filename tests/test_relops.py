"""Window / semi-join / grouping-sets relational operators vs DuckDB
on the sf0.001 testdata (the same comparison the driver's oracle gate
runs at sf0.01)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def _sql(q: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(q).fetchdf()


def test_cumsum_matches_duckdb(ray_session):
    from georay.entrylib import q_rel_cumsum
    eng = _canon(q_rel_cumsum(SF).to_pandas())
    ora = _canon(_sql("""
        select o_orderkey,
               cast(sum(cast(floor(o_totalprice*100+0.5) as bigint))
                    over (partition by o_custkey
                          order by o_orderdate, o_orderkey)
                    as bigint) as run_cents
        from orders"""))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_semi_join_matches_duckdb(ray_session):
    from georay.entrylib import q_rel_semi_join
    res = q_rel_semi_join(SF)
    eng = _canon(res.to_pandas() if hasattr(res, "to_pandas")
                 else pd.DataFrame(res))
    ora = _canon(_sql("""
        select c_custkey from customer
        where exists (select 1 from orders
                      where o_custkey = c_custkey
                        and o_orderstatus = 'F')"""))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_grouping_sets_matches_duckdb(ray_session):
    from georay.entrylib import q_rel_grouping_sets
    eng = _canon(q_rel_grouping_sets(SF).to_pandas())
    ora = _canon(_sql("""
        select coalesce(o_orderstatus, '(all)') as o_orderstatus,
               coalesce(o_orderpriority, '(all)') as o_orderpriority,
               cast(sum(cast(floor(o_totalprice*100+0.5) as bigint))
                    as bigint) as sum_c,
               count(*) as n
        from orders
        group by grouping sets ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())"""))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # the () grand total must equal the full table
    tot = eng[(eng.o_orderstatus == "(all)")
              & (eng.o_orderpriority == "(all)")]
    assert len(tot) == 1 and tot["n"].iloc[0] == len(
        _sql("select * from orders"))


def test_p90_per_key_matches_duckdb(ray_session):
    from georay.entrylib import q_rel_p90_per_key
    eng = _canon(q_rel_p90_per_key(SF).to_pandas())
    ora = _canon(_sql("""
        select c_mktsegment as seg,
               quantile_disc(cast(floor(o_totalprice*100+0.5) as bigint),
                             0.9) as p90_cents
        from orders join customer on o_custkey = c_custkey
        group by 1"""))
    import pandas as pd
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_distinct_per_key_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    from georay.entrylib import q_rel_distinct_per_key
    eng = _canon(q_rel_distinct_per_key(SF).to_pandas())
    ora = _canon(duckdb.sql(
        f"""select event_type, count(distinct user_id) as n_users
            from read_parquet('{SF}/events.parquet') group by 1""").df())
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_mode_per_key_matches_duckdb(ray_session):
    import pandas as pd
    from georay.entrylib import q_rel_mode_per_key
    eng = _canon(q_rel_mode_per_key(SF).to_pandas())
    ora = _canon(_sql("""
        with c as (select o_orderstatus, o_orderpriority, count(*) n
                   from orders group by 1, 2),
        r as (select *, row_number() over (partition by o_orderstatus
                     order by n desc, o_orderpriority asc) rn from c)
        select o_orderstatus, o_orderpriority as mode_priority,
               cast(n as bigint) as n
        from r where rn = 1"""))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
