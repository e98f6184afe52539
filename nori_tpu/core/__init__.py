"""Math and utility core (reference layer L0, SURVEY.md §1)."""
