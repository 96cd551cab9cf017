"""Round-9 surface: Lloyd-assignment cutover default (VERDICT.md r8
next-round #6) and the planted-cluster ANN recall fixture (#5)."""

from __future__ import annotations

import pytest

from map_reduce_c_sharp_simulation_multithreaded_spark.operators.similarity import (
    BROADCAST_ASSIGN_CUTOVER_K,
    _resolve_assign_mode,
)


class TestAssignModeCutover:
    """The trainer selects by k when broadcast_assign is None: literal
    up to the documented cutover, broadcast (requiring id_col) above —
    and validation happens in this pure helper BEFORE any Spark job
    (ADVICE r8: the old in-loop check wasted the seed-selection scan
    on an argument error)."""

    def test_default_literal_below_cutover(self):
        assert _resolve_assign_mode(8, None, None) is False
        assert _resolve_assign_mode(BROADCAST_ASSIGN_CUTOVER_K, None, None) is False

    def test_default_broadcast_above_cutover(self):
        assert _resolve_assign_mode(
            BROADCAST_ASSIGN_CUTOVER_K + 1, "vec_id", None
        ) is True
        assert _resolve_assign_mode(2000, "vec_id", None) is True

    def test_above_cutover_without_id_col_refuses_literal_silently(self):
        with pytest.raises(ValueError, match="cutover"):
            _resolve_assign_mode(2000, None, None)

    def test_explicit_false_is_the_escape_hatch(self):
        assert _resolve_assign_mode(2000, None, False) is False

    def test_explicit_true_requires_id_col(self):
        with pytest.raises(ValueError, match="id_col"):
            _resolve_assign_mode(8, None, True)
