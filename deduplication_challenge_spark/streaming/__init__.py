"""Structured Streaming variants of the batch operators.

The reference and the north rule are strictly batch (SURVEY.md §2.8 — the
"resumable" requirement is batch re-entrancy, implemented in
plans/pipeline.py). These streaming operators are the forward path for a
continuously-crawled corpus: same kernels, readStream sources, watermarked
state."""
