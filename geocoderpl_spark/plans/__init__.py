"""End-to-end job plans: index build (with checkpoint/resume/lineage) and
query serving (SURVEY.md §3)."""
