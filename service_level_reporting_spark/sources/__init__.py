"""Source/sink connectors (SURVEY.md §2.1)."""
