from .tables import TABLES, load_table, register_views, spread_small_scan

__all__ = ["TABLES", "load_table", "register_views", "spread_small_scan"]
