"""Plans: declarative pipeline specs, sink writes, checkpoint/lineage."""
