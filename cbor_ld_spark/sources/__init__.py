from .corpus import (  # noqa: F401
    corpus_from_documents,
    load_repos,
    payload_variants,
    synthesize_corpus,
)
