"""Empty-corpus (cold-start) oracle audit — the fourth self-sustaining
edge audit (round 11; pattern of tests/test_null_corpus_audit.py).

Zero input rows is a state every deployment passes through, and the
round-11 probe found Spark and standard SQL genuinely disagree there:
Spark's ROLLUP/CUBE/GROUPING SETS emit ZERO rows (the () super-
aggregate expands into an ordinary groupBy — no groups, no rows) while
DuckDB emits the SQL-standard count-0 grand-total row. The engine's
contract is Spark's no-data-no-rows semantics; the three
super-aggregate oracles carry ``HAVING count(*) > 0`` (exact on
non-empty input). This audit re-proves, per pytest run, the
always-interesting subset — the three contract carriers plus one
representative per empty-input answer shape (ungrouped aggregate's
single count-0 row, empty window/top-k/percentile/pivot outputs, the
sketch-flag coalesce, a dedup tier, an ANN tier, a streaming drain) —
and the full-surface sweep (every queries() entry) under
SPARK_GRAFT_FULL_EMPTY_AUDIT=1.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


AUDIT_ENTRIES = [
    # the empty-input contract carriers (formerly DIVERGE: oracle emitted
    # the SQL-standard count-0 grand-total row, Spark emitted nothing)
    "q_rollup_counts",
    "q_cube_order_stats",
    "q_grouping_sets_sales",
    # one representative per cold-start answer shape
    "qc_running_total",      # ungrouped agg: BOTH engines emit one count-0 row
    "qd_counts_per_window",  # windowed agg: empty
    "q_tokenize_topk",       # top-k: empty
    "q_price_percentiles",   # exact percentiles: empty
    "q_approx_percentiles",  # sketch flag must stay vacuously TRUE, not NULL
    "q_pivot_daily",         # static pivot columns over no days
    "dedup_minhash_lsh",     # shingle tier: no evidence, no pairs
    "similarity_brute_topk", # ANN: no queries, no neighbors
    "stream_qb_counts",      # streaming drain over a zero-file replay
]


@pytest.fixture(scope="module")
def empty_corpus(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("emptycorpus") / "sfempty")
    _load_tool("make_empty_corpus").build("/root/testdata/sf0.001", dst)
    return dst


@pytest.fixture(scope="module")
def duck_views(empty_corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS FROM '{empty_corpus}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", AUDIT_ENTRIES)
def test_entry_matches_oracle_on_empty_corpus(spark, empty_corpus, duck_views, name):
    import __spark_entry__ as entry_mod

    check = _load_tool("check_oracle")
    sdf = entry_mod.queries()[name](spark, empty_corpus)
    ddf = duck_views.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    problems = check.compare(name, sdf, ddf)
    assert not problems, f"{name} diverged on the empty corpus: {problems}"


def test_super_aggregate_empty_contract_binds(spark, empty_corpus, duck_views):
    """The contract's two sides, asserted directly: Spark's CUBE emits
    zero rows on the empty corpus, and the UNFILTERED oracle form
    (HAVING stripped) emits exactly the one SQL-standard grand-total
    row — proving the HAVING line is load-bearing on this corpus and
    a no-op wherever count >= 1."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["q_cube_order_stats"](spark, empty_corpus).count()
    assert rows == 0
    sql = entry_mod.oracle_sql()["q_cube_order_stats"]
    assert "HAVING count(*) > 0" in sql
    unfiltered = sql.replace("HAVING count(*) > 0", "")
    assert len(duck_views.execute(unfiltered).fetchall()) == 1


def test_empty_corpus_full_surface_when_enabled(spark, empty_corpus, duck_views):
    """All 84 entries against their oracles on the empty corpus —
    opt-in like the NULL-corpus full sweep (SPARK_GRAFT_FULL_EMPTY_AUDIT=1)."""
    if not os.environ.get("SPARK_GRAFT_FULL_EMPTY_AUDIT"):
        pytest.skip("set SPARK_GRAFT_FULL_EMPTY_AUDIT=1 for the full-surface sweep")
    import __spark_entry__ as entry_mod

    check = _load_tool("check_oracle")
    oracles = entry_mod.oracle_sql()
    failures = {}
    for name, fn in entry_mod.queries().items():
        sdf = fn(spark, empty_corpus)
        ddf = duck_views.execute(oracles[name]).fetch_arrow_table()
        problems = check.compare(name, sdf, ddf)
        if problems:
            failures[name] = problems
    assert not failures, failures
