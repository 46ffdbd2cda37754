from .files import load_table, load_tables, read_tem_csv

__all__ = ["load_table", "load_tables", "read_tem_csv"]
