"""Custom batch data sources (Python Data Source API, Spark 4)."""
