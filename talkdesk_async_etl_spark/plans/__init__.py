"""Query plans: the engine's declared operator inventory (SURVEY.md §2)."""
