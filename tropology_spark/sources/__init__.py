"""Sources and sinks (SURVEY.md §2 A-rows)."""
