"""Engine operators (SURVEY.md §2): docID assignment, posting build,
top-k scoring, dedup, similarity search, text stats."""
