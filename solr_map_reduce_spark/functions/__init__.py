"""Record-level functions (SURVEY §2.B): analyzers, timestamp conversion."""
