from .ingest import stream_corpus, stream_kg_results  # noqa: F401
from .windowed import stream_windowed_health, windowed_ingest_health  # noqa: F401
