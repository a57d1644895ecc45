"""Streaming / incremental execution.

The reference has NO streaming operators (SURVEY.md §2.5): its
incremental behaviors are resume-from-checkpoint and a daily
snapshot-diff loop, both mapped to incremental batch (plans/checkpoint,
queries snapshot_diff). This package additionally provides a real
Structured Streaming deployment of the geo-tag pipeline for
continuously arriving crawl data.
"""
