from .pipeline import (  # noqa: F401
    cdc_apply_batch,
    foreach_batch_upsert,
    parquet_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stream_dedup,
    stream_interval_join,
    stream_interval_join_outer,
    validated_json,
    windowed_counts,
)
from .stateful import (  # noqa: F401
    stream_running_stats,
    stream_topk_retention,
)
