from .events import (  # noqa: F401
    daily_counts_stream,
    read_event_stream,
    run_available_now,
    session_counts_stream,
    sliding_rate_stream,
    stage_event_chunks,
    upsert_stream_foreach_batch,
    user_totals_stream,
)
from .dedup import (  # noqa: F401
    first_seen_stream,
    read_doc_stream,
    stage_doc_chunks,
)
from .extract import (  # noqa: F401
    read_span_stream,
    run_extract_stream,
    stage_span_chunks,
)
