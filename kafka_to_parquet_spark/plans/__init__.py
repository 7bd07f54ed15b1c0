"""Plan inspection utilities — assert the physical plans we rely on
for the 100 TB story actually materialize (pushdown, pruning,
broadcast, codegen)."""
