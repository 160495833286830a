"""Structured Streaming variants of the event queries (SURVEY.md §7 step 5).

The reference is batch-only ("a stream exists only in the Unix-pipe sense" —
SURVEY.md §1); streaming is a north-star extension, so the batch twins in
plans/relational.py are the declared queries and these are the incremental
versions of the same logical plans."""
