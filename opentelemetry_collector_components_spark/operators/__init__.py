"""Pipeline operators: DataFrame -> DataFrame transforms (SURVEY.md §2)."""
