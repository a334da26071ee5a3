from .tables import ensure_parquet, read_pages, read_table

__all__ = ["read_table", "read_pages", "ensure_parquet"]
