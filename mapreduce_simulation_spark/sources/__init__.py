"""Sources and sinks: text-directory scan and part-file output — the
reference engine's S1-S6 surface (SURVEY.md §2a), plus parquet/csv/json."""
