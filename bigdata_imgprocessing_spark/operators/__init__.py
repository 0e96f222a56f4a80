"""Reusable distributed operators the built-in DataFrame API lacks,
each expressed as a composition of existing ops (SURVEY.md custom-operator
rule (a)): as-of join, minhash signatures, LSH bucketing, etc."""

from .asof import asof_join

__all__ = ["asof_join"]
