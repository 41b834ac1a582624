"""Utilities: logging, profiling spans (the L1 layer of SURVEY.md §1)."""
from .logging import FileLogger, SpanTimer  # noqa: F401
