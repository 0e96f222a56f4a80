from .csv_io import read_semicolon_csv, write_semicolon_csv, write_single_text
from .cached import materialize, read_or_compute

__all__ = [
    "read_semicolon_csv",
    "write_semicolon_csv",
    "write_single_text",
    "materialize",
    "read_or_compute",
]
