"""Sources: synthetic fixture generation and table readers."""
