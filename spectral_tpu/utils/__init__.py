"""Runtime utilities: options database, output writers, logging."""
