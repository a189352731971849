from .dedup_stream import stream_dedup_keep_first  # noqa: F401
from .ingest import stream_corpus, stream_kg_results  # noqa: F401
from .stateful import session_stream  # noqa: F401
from .windowed import stream_windowed_health, windowed_ingest_health  # noqa: F401
