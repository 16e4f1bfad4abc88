"""SURVEY §2 queries — placeholder, filled in build phases."""
