from .udfs import DOC_RESULT_SCHEMA, jsonld_sniff, kg_process_batches  # noqa: F401
