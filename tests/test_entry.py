"""Driver-contract smoke: __spark_entry__.entry/queries/oracle_sql."""

from __future__ import annotations

import importlib.util
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_and_is_stable(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["lang", "n_docs", "total_chars", "avg_chars"]
    # deterministic: rerun matches
    again = mod.entry(spark).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_every_oracle_has_a_query(spark):
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    # every query callable is actually callable with (spark, sf_dir)
    assert all(callable(fn) for fn in q.values())
    # every query — including the kernel chain, via the expected-result
    # fixture corpus — now carries an exact DuckDB oracle
    assert set(q) == set(o)
