"""Driver-contract hygiene: the zero-rows-only claim is structural, not
anecdotal — every queries() entry must carry an oracle_sql() twin, and
vice versa, so a new query can never silently ship ungated."""

import __spark_entry__ as entrymod


def test_every_query_has_an_exact_oracle_and_no_orphans():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_oracle_sql_strings_are_select_statements():
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callables():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
