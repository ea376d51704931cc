"""Sources and sinks: document table readers, synthetic fixture generator."""
