from .events import (
    EVENTS_SCHEMA,
    hourly_user_features,
    read_events_stream,
    run_stream_to_memory,
    session_stats,
    sliding_user_features,
    sessionize,
    user_profile_features,
)
from .node_store import (
    ConcurrentWriteError,
    SnapshotStore,
    stream_profiles_into_store,
    vacuum_snapshots,
)
from .vector_store import stream_vectors_into_store
from .crawl import stream_dedup_into_band_index
from .doc_index import read_index_stats, stream_docs_into_index
from .scd_stream import SCD2Store, scd2_store_apply, stream_changes_into_scd2
from .stateful import stream_rolling_anomaly, stream_sessionize
from .quality_stream import read_routed, stream_quality_route
from .embedding_stream import (
    cooc_delta,
    merge_cooc,
    refit_from_store,
    stream_docs_into_cooc_store,
)

__all__ = [
    "read_routed",
    "cooc_delta",
    "merge_cooc",
    "refit_from_store",
    "stream_docs_into_cooc_store",
    "stream_quality_route",
    "SCD2Store",
    "scd2_store_apply",
    "stream_changes_into_scd2",
    "EVENTS_SCHEMA",
    "hourly_user_features",
    "read_events_stream",
    "ConcurrentWriteError",
    "SnapshotStore",
    "stream_profiles_into_store",
    "vacuum_snapshots",
    "stream_vectors_into_store",
    "read_index_stats",
    "stream_dedup_into_band_index",
    "stream_docs_into_index",
    "run_stream_to_memory",
    "session_stats",
    "sliding_user_features",
    "sessionize",
    "stream_sessionize",
    "stream_rolling_anomaly",
    "user_profile_features",
]
