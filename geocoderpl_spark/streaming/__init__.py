"""Structured-Streaming surface: incremental index maintenance.

The reference is strictly batch (SURVEY.md §2.8); streaming here covers the
*beyond-reference* requirement: keeping the inverted index fresh as new
corpus files land, without rebuilding from scratch.
"""
