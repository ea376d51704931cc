"""Ray Data pipeline stages: parse → block → score → cluster."""
