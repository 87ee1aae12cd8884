from .parquet import FIXTURE_TABLES, load_table, load_tables, publications

__all__ = ["FIXTURE_TABLES", "load_table", "load_tables", "publications"]
