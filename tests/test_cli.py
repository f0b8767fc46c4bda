"""CLI front-door tests (registry-only paths; `run`/`explain` spin their own
session and are covered by the smoke of the same builders elsewhere)."""

from __future__ import annotations

import pytest

from cdc_worker_spark.__main__ import main


def test_list_filters(capsys):
    assert main(["list", "--filter", "q_ts_"]) == 0
    out = capsys.readouterr().out
    assert "q_ts_gapfill  [oracle]" in out
    assert "q_join_multi" not in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q_agg_global"]) == 0
    assert "sum_price" in capsys.readouterr().out


def test_oracle_rows_only_errors():
    assert main(["oracle", "q_dedup_minhash"]) == 1


def test_unknown_query_errors():
    with pytest.raises(SystemExit):
        main(["run"])  # missing query arg -> argparse exits
    assert main(["oracle", "q_nope"]) == 1  # oracle path: None -> 1
