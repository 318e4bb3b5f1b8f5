from .tables import TESTDATA_TABLES, load_table, load_tables
from .interactions import events_as_interactions, implicit_urm

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "events_as_interactions",
    "implicit_urm",
]
