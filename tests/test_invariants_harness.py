"""The oracle-free invariant harness (scripts/verify_invariants.py) must not
rot between the big sf100 sweeps: its dialect shim, fingerprint, and a
representative slice of its checks run here at the test fixture scale."""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def inv():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "verify_invariants.py",
    )
    spec = importlib.util.spec_from_file_location("verify_invariants", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["verify_invariants"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ctx(inv, spark):
    from cdc_worker_spark.plans import all_queries
    from cdc_worker_spark.sources.tables import register_views

    register_views(spark, SF_DIR)
    inv.register_shims(spark, SF_DIR)
    return inv.Ctx(spark, SF_DIR, all_queries())


def test_fingerprint_is_order_insensitive_and_value_sensitive(inv, spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k: int, v: string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "k: int, v: string")
    c = spark.createDataFrame([(1, "x"), (2, "z")], "k: int, v: string")
    assert inv.fingerprint(a) == inv.fingerprint(b)
    assert inv.fingerprint(a) != inv.fingerprint(c)


def test_lifted_oracle_dual_matches_builder(inv, ctx, spark):
    """A shim-lifted oracle (epoch_ms UDF + rewrites) must equal its
    builder at fixture scale — the calibration the sf100 sweep rests on."""
    from cdc_worker_spark.plans.registry import REGISTRY

    for name in ("q_tpch_q1", "q_agg_salted_hot", "q_cdc_latest_state"):
        df = ctx.qs[name](spark, SF_DIR)
        odf = spark.sql(inv.rewrite_oracle(REGISTRY[name].oracle))
        assert inv.fingerprint(df) == inv.fingerprint(odf), name


def test_rewrite_oracle_dialect_forms(inv):
    """Unit checks on the r8 shim rules: exclusive range, literal split,
    1-based subscripts/slices, regexp 'g' flag, IGNORE NULLS arg form,
    string_agg WITHIN GROUP."""
    rw = inv.rewrite_oracle
    # DuckDB range is stop-exclusive and empty when b <= a
    out = rw("SELECT unnest(range(1, greatest(len(ws) - 1, 1))) AS i")
    assert "sequence(1, (greatest(size(ws) - 1, 1)) - 1)" in out
    assert "CASE WHEN (greatest(size(ws) - 1, 1)) > (1)" in out
    # string_split delimiter is literal, not a regex
    assert rw("string_split(text, '. ')") == (
        "split(text, concat('\\\\Q', '. ', '\\\\E'))"
    )
    # 1-based slice and subscript, index cast to INT for element_at
    assert rw("ws[i+1:i+5]") == "slice(ws, i+1, (i+5) - (i+1) + 1)"
    assert rw("ws[i]") == "try_element_at(ws, CAST(i AS INT))"
    # regexp_replace 'g' flag: Spark is always-global, 4th arg is position
    assert rw("regexp_replace(t, 'a', 'b', 'g')") == (
        "regexp_replace(t, 'a', 'b')"
    )
    # r9: commas/parens INSIDE string literals are not arg separators —
    # the quantifier comma must survive verbatim and the 'g' still drops,
    # including on the nested inner call (q_text_scrub_pii's shape; the
    # quote-unaware r8 splitter shipped 'g' through to Spark's position
    # arg and mangled the pattern to '{2, }')
    assert rw(
        "regexp_replace(regexp_replace(t, '[a-z]{2,}', '<E>', 'g'),"
        " '[0-9]{7,}', '<N>', 'g')"
    ) == (
        "regexp_replace(regexp_replace(t, '[a-z]{2,}', '<E>'),"
        " '[0-9]{7,}', '<N>')"
    )
    # fn(x IGNORE NULLS) OVER -> fn(x, true) OVER
    assert rw("last_value(v IGNORE NULLS) OVER w") == (
        "last_value(v, true) OVER w"
    )
    # ordered string_agg -> WITHIN GROUP
    assert rw("string_agg(s, ',' ORDER BY s)") == (
        "string_agg(s, ',') WITHIN GROUP (ORDER BY s)"
    )
    # the dot-product idiom collapses to aggregate(zip_with(...))
    dot = rw(
        "list_reduce(list_transform(list_zip(q.dv, c.dv), p -> p[1] * p[2]),"
        " (x, y) -> x + y)"
    )
    assert dot.startswith("aggregate(zip_with(q.dv, c.dv,")


def test_merge_covers_declared_or_raises(inv):
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "run_invariants.py",
    )
    spec = importlib.util.spec_from_file_location("run_invariants", path)
    runner = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(runner)
    parts = [
        {"results": {"q_a": [{"check": "x", "ok": True, "detail": ""}]},
         "wall_sec": 1.0, "n_fail": 0},
        {"results": {"q_b": [{"check": "y", "ok": False, "detail": ""}]},
         "wall_sec": 2.0, "n_fail": 1},
    ]
    merged = runner.merge_parts(parts, ["q_a", "q_b"], "sfX")
    assert merged["n_queries"] == 2 and merged["n_fail"] == 1
    assert len(merged["chunks"]) == 2
    with pytest.raises(RuntimeError, match="q_missing"):
        runner.merge_parts(parts, ["q_a", "q_b", "q_missing"], "sfX")


def _runner_mod():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "run_invariants.py",
    )
    spec = importlib.util.spec_from_file_location("run_invariants", path)
    runner = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(runner)
    return runner


def test_repair_retries_planted_dead_context_part(tmp_path):
    """VERDICT r09 next #3: the repair pass must find a query whose
    latest part state is a dead-SparkContext run-ERROR (the r9 sweep's
    part_zfix3 shape), retry it in a fresh JVM, and report clean once the
    retry part overrides — and must also pick up declared queries with
    no part at all."""
    import json

    runner = _runner_mod()
    parts = tmp_path / "parts"
    parts.mkdir()
    good = [{"check": "dual_lifted_oracle_equals_builder", "ok": True,
             "detail": "builder=x oracle=x"}]
    dead = [{"check": "run", "ok": False,
             "detail": "ERROR An error occurred while calling o1294.parquet"
                       " : java.lang.IllegalStateException: Cannot call"
                       " methods on a stopped SparkContext"}]
    uncov = [{"check": "dual_lifted_oracle", "ok": None,
              "detail": "runtime_blocked(sf100): Job aborted"},
             {"check": "no_live_check", "ok": False,
              "detail": "UNCOVERED: dual runtime_blocked(sf100) and no"
                        " bespoke check"}]
    (parts / "part_000.json").write_text(json.dumps(
        {"sf_dir": "sfX", "results": {"q_ok": good, "q_dead": dead,
                                      "q_uncov": uncov}}))
    declared = ["q_ok", "q_dead", "q_uncov", "q_never"]

    bad, never = runner.scan_parts(parts, declared)
    assert set(bad) == {"q_dead", "q_uncov"} and never == ["q_never"]

    retried = []

    def fake_runner(names, sf, out, timeout, driver_mem):
        retried.extend(names)
        part = {"sf_dir": sf, "results": {names[0]: list(good)}}
        out.write_text(json.dumps(part))
        return part

    n_bad = runner.repair_parts(
        parts, declared, "sfX", None, set(), runner=fake_runner
    )
    assert sorted(retried) == ["q_dead", "q_never", "q_uncov"]
    assert n_bad == 0
    # the retry parts must override in merge order (part_zzrepair_* sorts
    # after every stream/zfix part name used by the sweeps)
    bad, never = runner.scan_parts(parts, declared)
    assert not bad and not never


def test_repair_reports_still_bad_when_retry_fails(tmp_path):
    import json

    runner = _runner_mod()
    parts = tmp_path / "parts"
    parts.mkdir()
    dead = [{"check": "run", "ok": False, "detail": "ERROR boom"}]
    (parts / "part_000.json").write_text(
        json.dumps({"sf_dir": "sfX", "results": {"q_dead": dead}}))

    def failing_runner(names, sf, out, timeout, driver_mem):
        return None  # JVM died again, no part produced

    n_bad = runner.repair_parts(
        parts, ["q_dead"], "sfX", None, set(), runner=failing_runner
    )
    assert n_bad == 1  # wrapper must exit nonzero — never silent


def test_real_failures_are_not_misclassified_as_dead_chunks(tmp_path):
    """ADVICE r10: _is_bad_check must key on the CHECK NAME, not detail
    substrings — a genuinely failing invariant whose detail contains
    'missing'/'crashed'/'UNCOVERED' as free text is a REAL failure the
    sweep must report (exit nonzero via n_fail), not a dead chunk the
    repair pass re-runs forever."""
    import json

    runner = _runner_mod()
    parts = tmp_path / "parts"
    parts.mkdir()
    real_fail = [{"check": "gapfill_grid_complete_per_user", "ok": False,
                  "detail": "user 42 grid missing 3 days; 2 rows crashed"
                            " the UNCOVERED window"}]
    (parts / "part_000.json").write_text(
        json.dumps({"sf_dir": "sfX", "results": {"q_fail": real_fail}}))

    bad, never = runner.scan_parts(parts, ["q_fail"])
    assert not bad and not never  # completed with a real failure — no retry
    merged = runner.merge_parts(
        [json.loads((parts / "part_000.json").read_text())],
        ["q_fail"], "sfX",
    )
    assert merged["n_fail"] == 1  # ...but the failure still counts

    # the two synthesized dead/uncovered states stay bad by NAME
    assert runner._is_bad_check(
        {"check": "run", "ok": False, "detail": "ERROR boom"})
    assert runner._is_bad_check(
        {"check": "no_live_check", "ok": False,
         "detail": "UNCOVERED: dual absent and no bespoke check"})
    assert not runner._is_bad_check(
        {"check": "dual_lifted_oracle", "ok": False,
         "detail": "excluded_pinned(sf10): lifted plan OOMs at sf100"})


def test_dual_block_taxonomy_and_pinned_evidence(inv):
    """VERDICT r09 next #4: {dialect_blocked, runtime_blocked(sf),
    excluded_pinned(sf)} — exclusions carry a pin scale + artifact that
    the sweep validates LIVE against the committed pin file."""
    # ADVICE r9 #1: the gate parses the scale token, not a substring
    assert inv._sf_token("/root/repo/.fixtures/sf100") == "100"
    assert inv._sf_token("/x/sf1000/y") == "1000"  # would NOT match "100"
    assert inv._sf_token("/root/testdata/sf0.01") == "0.01"
    for name, entry in inv.DUAL_SF100_EXCLUDE.items():
        pin_sf, artifact, reason = entry
        assert pin_sf == "10" and artifact.endswith(".json") and reason
    # the committed pagerank pin must satisfy its own evidence check
    check, ok, detail = inv._pinned_dual_evidence(
        "q_graph_pagerank", "10", "INVARIANTS_sf10_pagerank_dual.json"
    )
    assert check == "dual_pinned_evidence" and ok is True, detail
    # a missing artifact is a FAIL, not a skip
    _, ok, detail = inv._pinned_dual_evidence(
        "q_graph_pagerank", "10", "NO_SUCH_ARTIFACT.json"
    )
    assert ok is False and "missing" in detail


def test_rewriter_skips_call_names_inside_string_literals(inv):
    """ADVICE r9 #3: a call-name token inside a quoted region is not a
    call site, and double-quoted identifiers share the quote state."""
    rw = inv.rewrite_oracle
    sql = "SELECT 'use range(1, 9)' AS hint, range(1, 3) AS r"
    out = rw(sql)
    assert "'use range(1, 9)'" in out  # literal untouched
    assert "sequence(1, (3) - 1)" in out  # real call rewritten
    # double-quoted identifier containing a comma must not split args
    sql2 = 'string_split("a,b", \'-\')'
    assert rw(sql2) == 'split("a,b", concat(\'\\\\Q\', \'-\', \'\\\\E\'))'


def test_named_invariants_pass_at_fixture_scale(inv, ctx, spark):
    checks = []
    checks += inv.check_pagerank_mass(
        ctx, ctx.qs["q_graph_pagerank_directed"](spark, SF_DIR)
    )
    checks += inv.check_salted_equals_plain(
        ctx, ctx.qs["q_agg_salted_hot"](spark, SF_DIR)
    )
    checks += inv.check_incr_agg_monoid(
        ctx, ctx.qs["q_cdc_incr_agg"](spark, SF_DIR)
    )
    checks += inv.check_scd2(ctx, ctx.qs["q_cdc_scd2"](spark, SF_DIR))
    bad = [(c, d) for c, ok, d in checks if not ok]
    assert not bad, bad


def test_invariant_checks_catch_a_planted_violation(inv, ctx, spark):
    """Negative control: a corrupted result must FAIL its invariant (the
    sweep cannot pass vacuously)."""
    from pyspark.sql import functions as F

    good = ctx.qs["q_graph_pagerank_directed"](spark, SF_DIR)
    bad = good.withColumn(
        "rank_scaled", F.col("rank_scaled") * 1.5
    )  # breaks mass conservation
    (name, ok, detail), = inv.check_pagerank_mass(ctx, bad)
    assert not ok, detail
