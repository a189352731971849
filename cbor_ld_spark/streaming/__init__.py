from .ingest import stream_corpus, stream_kg_results  # noqa: F401
