"""Utilities: printing, profiling, checkpointing, program cache."""

from . import checkpoint, printing, profiling
from .program_cache import cached_program

__all__ = ["checkpoint", "printing", "profiling", "cached_program"]
