"""Shared DuckDB view bootstrap for the local oracle tools.

The driver (and SparkEntry's Tables) read these ten parquet tables; any
tool replaying oracle SQL needs the same views. Single-sourced so a new
corpus table lands in every tool at once (check_correctness.py and
lint_oracle_types.py both import this).
"""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir):
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
