"""Command-line entry points (the reference's TEMPURA_*/TEATGT_*/KCC_* scripts)."""
