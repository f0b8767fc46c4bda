"""Small-heap session tuning (sources/tables._tune_for_heap): the ADVICE r6
contract — changes are opt-out-able via env var and announced once per knob,
so a session owner can tell an engine override from an unset default."""

from __future__ import annotations

from cdc_worker_spark.sources import tables as T


def test_heap_tune_env_gate(spark, monkeypatch):
    """SPARK_GRAFT_NO_HEAP_TUNE=1 short-circuits before touching the JVM or
    any conf (works even on sessions where the gateway probe would fail)."""
    monkeypatch.setenv("SPARK_GRAFT_NO_HEAP_TUNE", "1")
    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        )
    }
    T._tune_for_heap(spark)
    after = {k: spark.conf.get(k, None) for k in before}
    assert after == before


def test_heap_tune_logs_once_per_knob(spark, capsys):
    """Each overridden knob is announced exactly once per process, not once
    per load_table call (load_table runs per query)."""
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    old = spark.conf.get(key, "64MB")
    try:
        T._TUNE_LOGGED.discard(key)
        T._set_logged(spark, key, old)
        T._set_logged(spark, key, old)
        err = capsys.readouterr().err
        assert err.count("small-heap session") == 1
        assert key in err and "SPARK_GRAFT_NO_HEAP_TUNE" in err
    finally:
        spark.conf.set(key, old)
        T._TUNE_LOGGED.discard(key)
