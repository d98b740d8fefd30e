from .readers import load_table, load_tables, read_transactions_csv  # noqa: F401
