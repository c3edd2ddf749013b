"""Operator library over the relational testdata tables (SURVEY.md §2).

Each public function takes ``sf_dir`` and returns a Dataset / pandas
DataFrame / pyarrow Table, and has a matching DuckDB oracle SQL string in
``__ray_entry__.oracle_sql()`` (driver correctness gate).
"""
