from .pipeline import build_kg, edges_table, nodes_table  # noqa: F401
