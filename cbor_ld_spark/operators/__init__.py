from .kg import corpus_metrics, process_corpus, triples_table  # noqa: F401
