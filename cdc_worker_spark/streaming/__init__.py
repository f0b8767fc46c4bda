from cdc_worker_spark.streaming.envelope import (
    ACCOUNT_CHILD_FIELDS,
    ACCOUNT_FIELDS,
    ENVELOPE_SCHEMA,
    account_payload_schema,
    decode_envelope,
)
from cdc_worker_spark.streaming.pipeline import (
    LatestWinsState,
    read_event_stream,
    run_cdc_pipeline,
)

__all__ = [
    "ACCOUNT_CHILD_FIELDS",
    "ACCOUNT_FIELDS",
    "ENVELOPE_SCHEMA",
    "LatestWinsState",
    "account_payload_schema",
    "decode_envelope",
    "read_event_stream",
    "run_cdc_pipeline",
]
