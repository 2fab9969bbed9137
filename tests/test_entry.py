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


def test_queries_md_current():
    """QUERIES.md is a committed derived artifact like the fixtures — it
    must match a fresh generation (rerun scripts/gen_queries_md.py after
    any registry/docstring change)."""
    import importlib.util
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", os.path.join(repo, "scripts", "gen_queries_md.py")
    )
    gen = importlib.util.module_from_spec(spec)
    sys.modules["gen_queries_md"] = gen
    spec.loader.exec_module(gen)

    from rapidocr_spark.plans.shell import _registry, oracle_sql

    reg, sql = _registry(), oracle_sql()
    committed = open(os.path.join(repo, "QUERIES.md")).read()
    for i, (name, fn) in enumerate(reg.items(), 1):
        gate = "driver" if i <= 50 else "parity"
        kind = "fixture" if "read_parquet" in sql.get(name, "") else "sql"
        expect = f"| {i} | `{name}` | {gate} | {kind} | {gen.first_line(fn.__doc__)} |"
        assert expect in committed, f"QUERIES.md stale for {name!r} — rerun scripts/gen_queries_md.py"
    assert committed.count("\n| ") == len(reg) + 1  # header row + entries
