"""CLI / experiment drivers (replaces reference L6, cc.mallet.topics.tui)."""
