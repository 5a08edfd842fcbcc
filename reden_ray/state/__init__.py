"""Side-table state: dictionary and adjacency indices, checkpoints."""
