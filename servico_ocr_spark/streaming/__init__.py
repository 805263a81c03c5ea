"""Incremental/streaming execution of the extraction pipeline."""

from .incremental import run_available_now  # noqa: F401
