"""Pure per-record functions shared by stages, fixtures and tests."""
