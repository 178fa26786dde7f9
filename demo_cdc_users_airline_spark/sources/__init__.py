from .loader import load_table, load_tables, TESTDATA_TABLES

__all__ = ["load_table", "load_tables", "TESTDATA_TABLES"]
