"""Error taxonomy mirroring the reference's analyze-time validation.

The reference distinguishes *analyze-time* schema errors (unknown tag in a
filter -> error; see test case ``filter_non_existent_tag`` WantErr in
``/root/reference/test/cases/measure/measure.go``) from queries that merely
match nothing (empty result). We validate criteria against the declared
schema eagerly, before building any DataFrame plan.
"""

from __future__ import annotations


class BanyanError(Exception):
    """Base error for the engine."""


class SchemaError(BanyanError):
    """Resource/schema registry problem (unknown group/resource, bad spec)."""


class QueryAnalyzeError(BanyanError):
    """Query references unknown tags/fields or is otherwise malformed.

    Mirrors analyze-time failures in
    ``pkg/query/logical/measure/measure_analyzer.go`` (reference).
    """
