"""Pure DataFrame -> DataFrame operator library (SURVEY §2 inventory)."""
