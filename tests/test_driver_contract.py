"""Driver-contract invariants derived from the dicts themselves, so the
documented counts (SURVEY.md §2.7, README) cannot silently go stale."""

import sys


def _entry():
    sys.path.insert(0, ".")
    import __ray_entry__ as m

    return m


def test_every_query_has_an_oracle():
    m = _entry()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) == 266, f"query count drifted: {len(qs)}"
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"queries without oracle SQL: {missing}"
    extra = sorted(set(oracles) - set(qs))
    assert not extra, f"oracles without a query: {extra}"


def test_oracle_sql_is_parseable():
    import duckdb

    m = _entry()
    con = duckdb.connect()
    # empty tables with the driver's schemas are enough to type-check SQL
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.sql("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INT)")
    con.sql("CREATE TABLE lineitem AS SELECT 1::BIGINT l_orderkey, 1::BIGINT l_linenumber, 1::BIGINT l_partkey, 1::BIGINT l_suppkey, 1.0 l_quantity, 1.0 l_extendedprice, 1.0 l_discount, 1.0 l_tax, 'r' l_returnflag, 's' l_linestatus, now() l_shipdate WHERE false")
    con.sql("CREATE TABLE orders AS SELECT 1::BIGINT o_orderkey, 1::BIGINT o_custkey, now() o_orderdate, 'p' o_orderpriority, 1.0 o_totalprice WHERE false")
    con.sql("CREATE TABLE supplier AS SELECT 1::BIGINT s_suppkey, 1::BIGINT s_nationkey WHERE false")
    con.sql("CREATE TABLE events AS SELECT 1::BIGINT event_id, 1::BIGINT user_id, now() ts, 'a' event_type, 1.0 AS \"value\", 'p' AS props WHERE false")
    con.sql("CREATE TABLE customer AS SELECT 1::BIGINT c_custkey, 'n' c_name, 1::BIGINT c_nationkey, 1.0 c_acctbal, 'm' c_mktsegment WHERE false")
    con.sql("CREATE TABLE nation AS SELECT 1::BIGINT n_nationkey, 1::BIGINT n_regionkey, 'n' n_name WHERE false")
    con.sql("CREATE TABLE region AS SELECT 1::BIGINT r_regionkey, 'r' r_name WHERE false")
    con.sql("CREATE TABLE part AS SELECT 1::BIGINT p_partkey, 'n' p_name, 'b' p_brand, 't' p_type, 1::BIGINT p_size, 1.0 p_retailprice WHERE false")
    for name, sql in m.oracle_sql().items():
        try:
            con.sql(sql)  # plans (and runs on empty inputs) — syntax gate
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed to plan: {e}") from e
