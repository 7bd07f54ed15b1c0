"""Relational operators: projections/filters/distinct/set-ops/sorts
(relational.py), joins (joins.py), aggregations (aggregates.py),
window functions (windows.py).

The reference implements none of these (SURVEY §2.2-2.7: its entire
relational surface is scan → decode → project-to-payload → batch →
sink). Everything here is the (E) extension tier, expressed as pure
DataFrame plans so Catalyst supplies pushdown, pruning, join selection
and whole-stage codegen.
"""
