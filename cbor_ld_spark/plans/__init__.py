from .pipeline import build_kg, edges_table, nodes_table  # noqa: F401
from .shared import clear_shared_triples, shared_triples  # noqa: F401
