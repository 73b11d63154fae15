from .testdata import load_tables, register_views, table

__all__ = ["load_tables", "register_views", "table"]
