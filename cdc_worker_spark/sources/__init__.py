from cdc_worker_spark.sources.tables import TABLES, Catalog, load_events_ms, load_table

__all__ = ["TABLES", "Catalog", "load_events_ms", "load_table"]
