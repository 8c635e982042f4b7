from .readers import load_table, read_ratings_pipe, read_ratings_bookcrossing
from .sinks import write_semicolon, write_parquet

__all__ = [
    "load_table",
    "read_ratings_pipe",
    "read_ratings_bookcrossing",
    "write_semicolon",
    "write_parquet",
]
