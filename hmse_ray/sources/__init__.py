"""Sources: deterministic fixture generation + table readers."""
