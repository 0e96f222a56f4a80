"""Column-level helper functions shared across queries.

These encode the reference's scalar semantics (SURVEY.md §2.9) as
reusable Column builders — all built-in JVM expressions, no Python UDFs.
"""

from .helpers import first_letter, length_bucket, ordered_pairs, zero_guard_div

__all__ = ["first_letter", "length_bucket", "ordered_pairs", "zero_guard_div"]
