"""Graph sources: synthetic generators (SURVEY.md §2.10) and IO
readers/writers (SURVEY.md §2.9)."""
