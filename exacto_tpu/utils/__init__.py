"""Auxiliary subsystems: noise observability, serialization, profiling."""

from . import noise, serialization  # noqa: F401
