from cdc_worker_spark.functions.exprs import dec_sum, money_expr, ts_ms_col

__all__ = ["dec_sum", "money_expr", "ts_ms_col"]
