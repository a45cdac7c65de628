"""Sources: fixture-table loaders and format readers."""
